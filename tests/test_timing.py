"""Hardened timing harness (watsor_tpu/timing.py) — the chained-loop
measurement that TIMING_VALIDATION.jsonl and the BENCHMARKS.md "Timing
methodology" section rest on. The reference ships no benchmark suite
(BASELINE.md); these tests pin the harness's arithmetic and the data
chain that makes it tamper-proof.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from watsor_tpu.timing import chained_step_ms, chained_model_runner


def test_chained_step_ms_scales_with_work():
    # a step heavy enough to dominate dispatch on CPU: per-step time must
    # come out positive and the detail record complete; one compile
    # serves both loop lengths (dynamic bound)
    w = jnp.asarray(np.random.RandomState(0).randn(256, 256), jnp.float32)

    @jax.jit
    def run(seed, n):
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (256, 256), jnp.float32)
        x = jax.lax.fori_loop(0, n, lambda i, x: jnp.tanh(x @ w), x)
        return jnp.sum(x)

    ms, detail = chained_step_ms(run, n_short=1, n_long=16, reps=2)
    assert ms > 0
    assert detail['n_short'] == 1 and detail['n_long'] == 16
    assert len(detail['times_short_s']) == 2
    assert len(detail['times_long_s']) == 2
    assert 'compile_s' in detail


def test_chained_model_runner_executes_n_chained_steps():
    # fake detect_batch whose scores depend only on the input image:
    # the loop keeps img = img0 (dep is zero), so acc == n * scores[0,0]
    batch, size = 2, 8

    def step(params, img):
        s = jnp.mean(img.astype(jnp.float32), axis=(1, 2, 3)) * params
        scores = jnp.broadcast_to(s[:, None], (batch, 4))
        return None, scores, None, None

    run = chained_model_runner(step, jnp.float32(2.0), batch, size)
    a1 = float(run(7, 1))
    a5 = float(run(7, 5))
    assert a1 != 0.0
    assert a5 == pytest.approx(5.0 * a1, rel=1e-6)


def test_chained_model_runner_nonsquare_input():
    # production-1080p re-pin uses (H, W) tuples
    batch, hw = 2, (6, 10)
    seen = {}

    def step(params, img):
        seen['shape'] = img.shape
        s = jnp.sum(img.astype(jnp.float32), axis=(1, 2, 3))
        return None, jnp.broadcast_to(s[:, None], (batch, 4)), None, None

    run = chained_model_runner(step, jnp.float32(0), batch, hw)
    assert np.isfinite(float(run(3, 2)))
    assert seen['shape'] == (batch, 6, 10, 3)


def test_chained_model_runner_fresh_seed_changes_input():
    batch, size = 2, 8

    def step(params, img):
        s = jnp.sum(img.astype(jnp.float32), axis=(1, 2, 3))
        return None, jnp.broadcast_to(s[:, None], (batch, 4)), None, None

    run = chained_model_runner(step, jnp.float32(0), batch, size)
    assert float(run(1, 2)) != float(run(2, 2))


def test_chained_full_path_runner_tiny_shapes():
    """The full-device-path runner (detect + per-camera filters + pack +
    overlay render in one chained loop) compiles and executes on tiny
    shapes; the accumulator must reflect the detections the fake step
    emits (i.e. no stage was dead-code-eliminated)."""
    from typing import NamedTuple

    from watsor_tpu.ops.filter_device import NUM_LABELS
    from watsor_tpu.runtime.frames import MAX_ZONES
    from watsor_tpu.timing import chained_full_path_runner

    class Out(NamedTuple):
        boxes: jnp.ndarray
        scores: jnp.ndarray
        classes: jnp.ndarray
        valid: jnp.ndarray

    batch, hw, n_det = 2, (32, 48), 4

    def detect(params, img):
        # one high-confidence person box per frame, position tied to the
        # input pixels so the data chain is real
        base = jnp.mean(img.astype(jnp.float32)) * 0  # traced dependency
        boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.6, 0.6]], jnp.float32),
                         (n_det, 1))[None].repeat(batch, 0) + base
        scores = jnp.full((batch, n_det), 0.9, jnp.float32)
        classes = jnp.ones((batch, n_det), jnp.int32)
        return Out(boxes, scores, classes,
                   jnp.full((batch,), n_det, jnp.int32))

    conf = np.full((NUM_LABELS,), np.inf, np.float32)
    conf[1] = 0.5                                      # person allowed
    area = np.zeros((NUM_LABELS,), np.float32)
    zsat = np.zeros((MAX_ZONES, 9, 9), np.float32)     # zones disabled
    zallow = np.zeros((MAX_ZONES, NUM_LABELS), bool)
    tables = tuple(jnp.asarray(np.stack([t] * 3))
                   for t in (conf, area, zsat, zallow))
    row_idx = np.arange(batch, dtype=np.int32) % 3

    run = chained_full_path_runner(detect, None, tables, row_idx,
                                   batch, hw)
    a2 = float(run(11, 2))
    a4 = float(run(11, 4))
    assert np.isfinite(a2) and a2 != 0.0
    # packed-sum + render-sum accumulate per iteration; the img carry is
    # seed-stable here (dep derives from deterministic sums), so doubling
    # the loop roughly doubles the accumulator
    assert a4 == pytest.approx(2.0 * a2, rel=0.2)
