"""Per-stage roofline of the EfficientNet-Lite backbone — locates the
traffic/time inside the backbone section (which profile_lite4_sections.py
measured at only ~53% of HBM speed-of-light while BiFPN runs at 94%).

Each stage group (stem + stages 0-6) is jitted standalone against a
device-resident random input of that stage's true activation shape,
timed, and cost-analyzed, so low-%SoL stages point at layout/padding
losses (channel dims far from the 128-lane width at high resolution are
the prime suspect: stage 0 runs 24 channels at 320x320).

Run on the chip:

    cd /root/repo && python -u - < scripts/profile_backbone_stages.py

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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.efficientnet_lite import (ConvBN, MBConvLite,
                                                     lite_block_args)
    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.roofline import roofline_row, step_cost

    device = jax.devices()[0]
    det = build_from_zoo('efficientdet_' + VARIANT)
    cfg = det.config
    size = cfg.input_size
    bb = {col: tree['backbone'] for col, tree in det.params.items()}
    rng = np.random.RandomState(0)

    block_args = lite_block_args(cfg.variant)
    # group flat block indices by stage
    stages = {}
    for i, (expand, features, strides, kernel, stage) in \
            enumerate(block_args):
        stages.setdefault(stage, []).append(
            (i, expand, features, strides, kernel))

    # walk shapes: stem halves, then per-block strides
    groups = [('stem', None, (size, size, 3))]
    h = w = size // 2
    c = 32
    for stage in sorted(stages):
        groups.append((f'stage{stage}', stages[stage], (h, w, c)))
        for _, _, features, strides, _ in stages[stage]:
            h //= strides
            w //= strides
            c = features

    print(json.dumps({'variant': VARIANT, 'batch': BATCH,
                      'groups': [(g, s) for g, _, s in groups]}),
          file=sys.stderr, flush=True)

    out = {'variant': VARIANT, 'batch': BATCH, 'stages': []}
    for name, blocks, in_shape in groups:
        if blocks is None:
            module = ConvBN(32, (3, 3), strides=2, dtype=cfg.dtype)
            # applied as the root module, so no 'stem' scope level
            gvars = {col: tree['stem'] for col, tree in bb.items()}
        else:
            class StageRun(nn.Module):
                blocks_: tuple = tuple(blocks)

                @nn.compact
                def __call__(self, x):
                    for i, expand, features, strides, kernel in self.blocks_:
                        x = MBConvLite(features, kernel, strides, expand,
                                       dtype=cfg.dtype,
                                       name=f'block{i}')(x, False)
                    return x

            module = StageRun()
            keys = [f'block{i}' for i, *_ in blocks]
            gvars = {col: {k: tree[k] for k in keys}
                     for col, tree in bb.items()}

        gvars = jax.device_put(gvars, device)
        x = jax.device_put(
            rng.uniform(-1, 1, (BATCH,) + in_shape).astype(
                np.float32).astype(cfg.dtype), device)

        if blocks is None:
            run = jax.jit(lambda v, x: module.apply(v, x, False))
        else:
            run = jax.jit(module.apply)
        ms, comp = _time(run, gvars, x)
        flops, hbm = step_cost(run, gvars, x)
        row = roofline_row(name, BATCH, ms, flops, hbm, device)
        row['in_shape'] = list(in_shape)
        row['n_blocks'] = 0 if blocks is None else len(blocks)
        out['stages'].append(row)
        print('%s: %.2f ms (compile %.0fs) %s' % (name, ms, comp,
                                                  json.dumps(row)),
              file=sys.stderr, flush=True)

    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, 'LITE4_PROFILE.jsonl'), 'a') as fh:
        fh.write(json.dumps(out) + '\n')


main()
