"""Measure EfficientDet-Lite0..4 fused-step throughput on the real chip.

One variant per process invocation (isolated compile):
    python -u - lite3 < scripts/bench_effdet_variants.py   # via stdin, or
    cd /root/repo && python -u scripts/bench_effdet_variants.py lite3

Measures the full device program at the variant's NATIVE input size
(device MXU resize from 1080p ingest is benchmarked separately for SSD;
here frames arrive at model size, batch 32, device-resident — the same
protocol as bench.py). Appends one JSON line per variant to
EFFDET_RESULTS (default /tmp/effdet_results.jsonl).

Match: the reference's model table (/root/reference/README.md:446) lists
EfficientDet-Lite0-4 as supported model choices.
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get('BENCH_BATCH', 32))
STEPS = int(os.environ.get('BENCH_STEPS', 20))
OUT = os.environ.get('EFFDET_RESULTS', '/tmp/effdet_results.jsonl')
NORTH_STAR = 960.0  # 32 x 1080p x 30 FPS


def main(variant):
    import jax
    from watsor_tpu.models.efficientdet import build_effdet, lite_config

    cfg = lite_config(variant)
    size = cfg.input_size
    print('bench: building efficientdet_{} (input {}x{}) batch {}'.format(
        variant, size, size, BATCH), file=sys.stderr, flush=True)
    det = build_effdet(cfg)
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)

    rng = np.random.default_rng(0)
    frames = [jax.device_put(
        rng.integers(0, 255, (BATCH, size, size, 3), np.uint8), device)
        for _ in range(4)]

    t0 = perf_counter()
    out = det.detect_batch(params, frames[0])
    jax.block_until_ready(out)
    print('bench: warm in {:.1f}s'.format(perf_counter() - t0),
          file=sys.stderr, flush=True)

    # sustained: dispatch back-to-back, block once at the end
    start = perf_counter()
    outs = []
    for i in range(STEPS):
        outs.append(det.detect_batch(params, frames[i % len(frames)]))
    jax.block_until_ready(outs[-1])
    wall = perf_counter() - start
    ms_per_step = wall / STEPS * 1000.0
    fps = BATCH * STEPS / wall

    record = {
        'metric': 'efficientdet_{} fused step, batch {}, {}x{}, '
                  'device-resident'.format(variant, BATCH, size, size),
        'value': round(fps, 1),
        'unit': 'frames/s',
        'ms_per_step': round(ms_per_step, 2),
        'vs_north_star_960': round(fps / NORTH_STAR, 2),
        'device': str(device.device_kind),
    }
    line = json.dumps(record)
    print(line, flush=True)
    with open(OUT, 'a') as f:
        f.write(line + '\n')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'lite1')
