"""SSD-Inception-v2 fused-step throughput on the chip (batch 32, 300px,
device-resident — same protocol as bench.py).

timeout 3000 python -u scripts/bench_inception.py
"""

import json
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, '/root/repo')

BATCH, STEPS = 32, 20


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector
    det = build_detector(SSDConfig(backbone='inception_v2'))
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)
    rng = np.random.default_rng(0)
    frames = [jax.device_put(rng.integers(0, 255, (BATCH, 300, 300, 3),
                                          np.uint8), device)
              for _ in range(3)]
    t0 = perf_counter()
    jax.block_until_ready(det.detect_batch(params, frames[0]))
    print('warm in {:.1f}s'.format(perf_counter() - t0), file=sys.stderr)
    outs = []
    t = perf_counter()
    for i in range(STEPS):
        outs.append(det.detect_batch(params, frames[i % 3]))
    jax.block_until_ready(outs[-1])
    ms = (perf_counter() - t) / STEPS * 1000.0
    print(json.dumps({'model': 'ssd_inception_v2', 'batch': BATCH,
                      'ms_per_step': round(ms, 2),
                      'fps': round(BATCH / ms * 1000.0, 1)}))


if __name__ == '__main__':
    main()
