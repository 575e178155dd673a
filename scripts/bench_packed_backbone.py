"""A/B: EfficientNet-Lite backbone standard vs packed-early
(space-to-depth stem..stage2, ops/packed_conv.py) on the chip.

    cd /root/repo && python -u - < scripts/bench_packed_backbone.py

Env: LITE_VARIANT=lite4, BENCH_BATCH=32, BENCH_STEPS=10.
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
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.efficientnet_lite import EfficientNetLite
    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.roofline import roofline_row, step_cost

    device = jax.devices()[0]
    det = build_from_zoo('efficientdet_' + VARIANT)
    cfg = det.config
    size = cfg.input_size
    bvars = jax.device_put(
        {col: tree['backbone'] for col, tree in det.params.items()}, device)
    rng = np.random.RandomState(0)
    x = jax.device_put(
        rng.uniform(-1, 1, (BATCH, size, size, 3)).astype(
            np.float32).astype(cfg.dtype), device)

    out = {'variant': VARIANT, 'batch': BATCH}
    arms = os.environ.get('PACK_ARMS', 'standard,stem,early').split(',')
    for label in arms:
        bb = EfficientNetLite(cfg.variant, dtype=cfg.dtype,
                              packing={'standard': 'none',
                                       'stem': 'stem',
                                       'early': 'early'}[label])
        run = jax.jit(lambda v, x, bb=bb: bb.apply(v, x, False))
        ms, comp = _time(run, bvars, x)
        flops, hbm = step_cost(run, bvars, x)
        row = roofline_row(f'backbone_{label}', BATCH, ms, flops, hbm,
                           device)
        out[label] = row
        print('%s: %.2f ms (compile %.0fs) %s' % (label, ms, comp,
                                                  json.dumps(row)),
              file=sys.stderr, flush=True)

    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, 'LITE4_PROFILE.jsonl'), 'a') as fh:
        fh.write(json.dumps(out) + '\n')


main()
