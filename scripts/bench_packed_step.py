"""A/B the FULL fused detect step (resize+normalize+forward+decode+NMS)
with entry packing 'none' vs 'stem' — the backbone-only A/B showed
runtime packing of an already-materialized input loses (the padded
source read still happens); inside the step the resize einsum can fuse
straight into the s2d write, so the padded [S, S, 3] tensor never hits
HBM.

    cd /root/repo && python -u - < scripts/bench_packed_step.py

Env: LITE_VARIANT=lite4, BENCH_BATCH=32, BENCH_STEPS=10,
PACK_ARMS=none,stem.
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BATCH = int(os.environ.get('BENCH_BATCH', 32))
STEPS = int(os.environ.get('BENCH_STEPS', 10))
VARIANT = os.environ.get('LITE_VARIANT', 'lite4')


def _time(fn, *args):
    import jax
    t0 = perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = perf_counter() - t0
    t0 = perf_counter()
    outs = [fn(*args) for _ in range(STEPS)]
    jax.block_until_ready(outs[-1])
    return (perf_counter() - t0) * 1000.0 / STEPS, compile_s


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.efficientdet import build_effdet, lite_config
    from watsor_tpu.roofline import roofline_row, step_cost

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    size = lite_config(VARIANT).input_size
    # same input geometry as scripts/roofline.py for row comparability
    images = jax.device_put(
        rng.randint(0, 255, (BATCH, size, size, 3), dtype=np.uint8),
        device)

    out = {'variant': VARIANT, 'batch': BATCH, 'step': {}}
    params = None
    for arm in os.environ.get('PACK_ARMS', 'none,stem').split(','):
        cfg = lite_config(VARIANT)._replace(packing=arm)
        det = build_effdet(cfg, params=params)
        params = det.params            # same weights for both arms
        p_dev = jax.device_put(params, device)
        ms, comp = _time(det.detect_batch, p_dev, images)
        flops, hbm = step_cost(det.detect_batch, p_dev, images)
        row = roofline_row(f'step_packing_{arm}', BATCH, ms, flops, hbm,
                           device)
        out['step'][arm] = row
        print('%s: %.2f ms (compile %.0fs) %s' % (arm, ms, comp,
                                                  json.dumps(row)),
              file=sys.stderr, flush=True)

    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, 'LITE4_PROFILE.jsonl'), 'a') as fh:
        fh.write(json.dumps(out) + '\n')


main()
