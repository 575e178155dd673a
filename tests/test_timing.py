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
