"""The production configuration at full-resolution ingest: 1080p frames,
device MXU resize, fused_exact NMS, active labels {person, car} —
the exact program a 2-class deployment serves. Batch 16 (v5e HBM holds
16 x 1080p uint8 comfortably alongside weights).

timeout 3000 python -u scripts/bench_production_1080p.py
"""

import json
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, '/root/repo')

BATCH, STEPS = 16, 20


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector
    det = build_detector(SSDConfig(nms_mode='fused_exact',
                                   active_labels=(1, 3)))
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)
    rng = np.random.default_rng(0)
    frames = [jax.device_put(rng.integers(0, 255, (BATCH, 1080, 1920, 3),
                                          np.uint8), device)
              for _ in range(2)]
    t0 = perf_counter()
    jax.block_until_ready(det.detect_batch(params, frames[0]))
    print('warm in {:.1f}s'.format(perf_counter() - t0), file=sys.stderr)
    outs = []
    t = perf_counter()
    for i in range(STEPS):
        outs.append(det.detect_batch(params, frames[i % 2]))
    jax.block_until_ready(outs[-1])
    ms = (perf_counter() - t) / STEPS * 1000.0
    print(json.dumps({'config': '1080p ingest, fused_exact, C=2',
                      'batch': BATCH, 'ms_per_step': round(ms, 2),
                      'fps': round(BATCH / ms * 1000.0, 1)}))


if __name__ == '__main__':
    main()
