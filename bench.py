"""Benchmark: sustained single-chip throughput of the fused detection step.

Measures the full device program the pipeline runs per tick — uint8 camera
batch H2D, device resize+normalize, SSD-MobileNet-v2 (bf16) forward, anchor
decode, class-aware NMS, result D2H — at the north-star batch of 32 streams
(BASELINE.json). Steps are dispatched back-to-back (async) so transfers
overlap compute, the way the detector task drives the chip in production.

Baseline: the reference's single hardware accelerator (EdgeTPU / CUDA TRT)
sustains ~100-120 FPS on the same SSD task (README.md:455 — "5x" the ~24
FPS desktop CPU); vs_baseline is computed against 120 FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

BATCH = int(os.environ.get('BENCH_BATCH', 32))
WARMUP_STEPS = 3
MEASURE_STEPS = int(os.environ.get('BENCH_STEPS', 30))
BASELINE_FPS = 120.0  # reference single-accelerator throughput

# First compile of the batch-32 program over the axon tunnel takes several
# minutes; persist compiled executables so subsequent runs start instantly.
CACHE_DIR = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                           os.path.join(os.path.dirname(__file__),
                                        '.jit_cache'))


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from watsor_tpu.models.ssd import SSDConfig, build_detector

    config = SSDConfig()
    detector = build_detector(config)
    device = jax.devices()[0]
    params = jax.device_put(detector.params, device)
    step = detector.detect_batch

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (BATCH, 300, 300, 3), np.uint8)
              for _ in range(4)]

    # compile + warm
    _log('bench: compiling batch-{} step on {} (cache: {})'.format(
        BATCH, jax.devices()[0], CACHE_DIR))
    t_compile = perf_counter()
    for i in range(WARMUP_STEPS):
        out = step(params, jnp.asarray(frames[i % len(frames)]))
    jax.block_until_ready(out)
    _log('bench: warm in {:.1f}s'.format(perf_counter() - t_compile))

    # measured: back-to-back async dispatch, block once at the end
    t0 = perf_counter()
    outs = []
    for i in range(MEASURE_STEPS):
        outs.append(step(params, jnp.asarray(frames[i % len(frames)])))
    jax.block_until_ready(outs[-1])
    dt = perf_counter() - t0

    # p50 single-step latency (blocking per step — the frame->detection lag)
    lat = []
    for i in range(10):
        t1 = perf_counter()
        jax.block_until_ready(step(params, jnp.asarray(frames[i % len(frames)])))
        lat.append((perf_counter() - t1) * 1000.0)
    p50_ms = float(np.percentile(lat, 50))

    fps = BATCH * MEASURE_STEPS / dt
    result = {
        "metric": "ssd_mobilenet_v2_300 fused detect step, batch 32, 1 chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "p50_step_latency_ms": round(p50_ms, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
