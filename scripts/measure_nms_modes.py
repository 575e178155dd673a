"""Measure the fused detection step under each NMS mode on the real chip.

One compile per mode per process would be safest, but the three programs
share the forward so XLA compiles fast after the first; timebox the whole
run (CLAUDE.md: tunnel compiles are slow).

Usage: python scripts/measure_nms_modes.py [batch]
Prints one JSON line per mode: {"mode", "ms_per_step", "frames_per_s"}.
"""

import json
import sys
from time import perf_counter

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax

    from watsor_tpu.models.ssd import SSDConfig, build_detector

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    buffers = None
    params = None

    for mode in ('fused', 'fused_exact', 'exact'):
        detector = build_detector(SSDConfig(nms_mode=mode))
        if params is None:
            params = jax.device_put(detector.params, device)
            buffers = [jax.device_put(
                rng.randint(0, 255, (batch, 300, 300, 3), np.uint8), device)
                for _ in range(4)]
        step = detector.detect_batch
        print('compiling', mode, file=sys.stderr, flush=True)
        t0 = perf_counter()
        jax.block_until_ready(step(params, buffers[0]))
        print('compiled {} in {:.1f}s'.format(mode, perf_counter() - t0),
              file=sys.stderr, flush=True)
        steps = 30
        t0 = perf_counter()
        outs = [step(params, buffers[i % 4]) for i in range(steps)]
        jax.block_until_ready(outs[-1])
        elapsed = perf_counter() - t0
        print(json.dumps({
            'mode': mode,
            'ms_per_step': round(elapsed / steps * 1000.0, 2),
            'frames_per_s': round(batch * steps / elapsed, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
