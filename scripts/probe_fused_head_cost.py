"""Does the fused dual head actually cut XLA-counted HBM bytes?

The round-4 chained A/B (TIMING_VALIDATION.jsonl) measured the
`fused_heads` diet as time-neutral (±1%) at Lite0-2.  Two readings are
possible and this probe separates them with the compiler's own cost
model of the exact compiled program (the same `cost_analysis()` the
roofline uses): either the fusion removed bytes but the heads section
was not at bandwidth, or XLA had already deduplicated the pyramid
reads and the "diet" moved no bytes at all.

Run on the chip (two compiles, one process):

    cd /root/repo && timeout 560 python -u - < scripts/probe_fused_head_cost.py

Env: PROBE_MODEL=efficientdet_lite0, BENCH_BATCH=32.
Appends one JSON line to LITE_WATERFALL.jsonl (repo root).
"""

import json
import os
import sys

import numpy as np

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODEL = os.environ.get('PROBE_MODEL', 'efficientdet_lite0')
BATCH = int(os.environ.get('BENCH_BATCH', 32))


def cost_of(fused):
    import jax

    from watsor_tpu.models.zoo import build_from_zoo

    if fused:
        os.environ['WATSOR_FUSED_HEADS'] = '1'
    else:
        os.environ.pop('WATSOR_FUSED_HEADS', None)
    det = build_from_zoo(MODEL)
    size = det.config.input_size
    frames = jnp_frames = np.zeros((BATCH, size, size, 3), np.uint8)
    print('compiling %s fused=%s ...' % (MODEL, fused),
          file=sys.stderr, flush=True)
    compiled = (jax.jit(det.detect_batch)
                .lower(det.params, jnp_frames).compile())
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {'gflops_per_frame': round(cost.get('flops', 0.0)
                                      / BATCH / 1e9, 3),
            'hbm_mb_per_frame': round(cost.get('bytes accessed', 0.0)
                                      / BATCH / 2 ** 20, 1)}


def main():
    row = {'probe': 'fused_head_cost', 'model': MODEL, 'batch': BATCH,
           'standard': cost_of(False), 'fused': cost_of(True)}
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, 'LITE_WATERFALL.jsonl'), 'a') as fh:
        fh.write(json.dumps(row) + '\n')


main()
