"""Measure the full int8-activation step vs bf16 on the chip, per
pointwise formulation (VERDICT #4 acceptance: >=25% step-time reduction
at batch 32, cosine >= 0.95 vs float).

Runs in ONE process: bf16 baseline, then int8_full with
WATSOR_INT8_POINTWISE in (conv, dot, pallas). Prints one JSON line per
mode and writes /tmp/int8_full_results.json.

cd /root/repo && timeout 3000 python -u scripts/bench_int8_full.py
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get('BENCH_BATCH', 32))
STEPS = int(os.environ.get('BENCH_STEPS', 20))
MODES = os.environ.get('INT8_MODES', 'conv,dot,pallas').split(',')


def _sustained(step, params, frames):
    import jax
    jax.block_until_ready(step(params, frames[0]))    # compile
    outs = []
    t = perf_counter()
    for i in range(STEPS):
        outs.append(step(params, frames[i % len(frames)]))
    jax.block_until_ready(outs[-1])
    return (perf_counter() - t) / STEPS * 1000.0


def _cosine(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(np.dot(a, b) /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector

    device = jax.devices()[0]
    rng = np.random.default_rng(0)
    size = 300
    calib = rng.integers(0, 255, (8, size, size, 3), np.uint8)
    frames_np = [rng.integers(0, 255, (BATCH, size, size, 3), np.uint8)
                 for _ in range(3)]
    frames = [jax.device_put(f, device) for f in frames_np]

    print('building bf16 baseline...', file=sys.stderr, flush=True)
    det = build_detector(SSDConfig())
    params = jax.device_put(det.params, device)
    bf16_ms = _sustained(det.detect_batch, params, frames)
    ref_out = jax.device_get(det.detect_batch(params, frames[0]))
    results = {'bf16_ms': round(bf16_ms, 2),
               'bf16_fps': round(BATCH / bf16_ms * 1000.0, 1)}
    print(json.dumps({'mode': 'bf16', 'ms': results['bf16_ms'],
                      'fps': results['bf16_fps']}), flush=True)

    from watsor_tpu.models.ssd_int8 import build_int8_detector
    for mode in MODES:
        os.environ['WATSOR_INT8_POINTWISE'] = mode
        print('building int8_full ({})...'.format(mode), file=sys.stderr,
              flush=True)
        try:
            qdet = build_int8_detector(det, calib)
            qparams = jax.device_put(qdet.params, device)
            ms = _sustained(qdet.detect_batch, qparams, frames)
            q_out = jax.device_get(qdet.detect_batch(qparams, frames[0]))
            cos = _cosine(ref_out.scores, q_out.scores)
            row = {'mode': mode, 'ms': round(ms, 2),
                   'fps': round(BATCH / ms * 1000.0, 1),
                   'vs_bf16': round(bf16_ms / ms, 3),
                   'scores_cosine_vs_bf16': round(cos, 4)}
        except Exception as exc:
            row = {'mode': mode, 'error': '{}: {}'.format(
                type(exc).__name__, exc)[:500]}
        results[mode] = row
        print(json.dumps(row), flush=True)

    with open('/tmp/int8_full_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
