"""Byte/time split of the EfficientDet-Lite forward across its three
sections (backbone / BiFPN stack / heads) — directs the Lite4 traffic
work: the full step is memory-bound at ~75% of HBM speed-of-light
(LITE4_PROFILE.jsonl), so the question is WHERE the 1.27 GB/frame live.

Each section is jitted standalone against device-resident inputs (the
same params the full model uses, re-rooted per section), timed, and
cost-analyzed. Run on the chip:

    cd /root/repo && python -u - backbone fpn heads < scripts/profile_lite4_sections.py

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


def main(argv):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.efficientdet import (
        BiFPN, _Head, lite_config)
    from watsor_tpu.models.efficientnet_lite import ConvBN, EfficientNetLite
    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.roofline import roofline_row, step_cost

    sections = argv or ['backbone', 'fpn', 'heads']
    device = jax.devices()[0]
    det = build_from_zoo('efficientdet_' + VARIANT)
    cfg = det.config
    size = cfg.input_size
    rng = np.random.RandomState(0)
    x_in = jax.device_put(
        (rng.uniform(-1, 1, (BATCH, size, size, 3))).astype(
            np.float32).astype(jnp.bfloat16), device)

    def sub(tree, key):
        return {c: {key: tree[c][key]} for c in tree}

    def reroot(tree, key):
        return {c: tree[c][key] for c in tree}

    variables = det.params
    results = {'variant': VARIANT, 'batch': BATCH}

    # ---- backbone ---------------------------------------------------------
    backbone = EfficientNetLite(cfg.variant, dtype=cfg.dtype)

    @jax.jit
    def run_backbone(v, x):
        return backbone.apply(v, x, False)

    bvars = jax.device_put(reroot(variables, 'backbone'), device)
    if 'backbone' in sections:
        ms, comp = _time(run_backbone, bvars, x_in)
        flops, hbm = step_cost(run_backbone, bvars, x_in)
        results['backbone'] = roofline_row('backbone', BATCH, ms, flops,
                                           hbm, device)
        print('backbone: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
              file=sys.stderr, flush=True)

    c3, c4, c5 = jax.block_until_ready(run_backbone(bvars, x_in))

    # ---- BiFPN stack (resample_p6 + cells) --------------------------------
    class FPNOnly(nn.Module):
        @nn.compact
        def __call__(self, c3, c4, c5):
            p6 = nn.max_pool(
                ConvBN(cfg.fpn_channels, (1, 1), act=False, dtype=cfg.dtype,
                       name='resample_p6')(c5, False),
                (3, 3), strides=(2, 2), padding='SAME')
            p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding='SAME')
            feats = [c3, c4, c5, p6, p7]
            for r in range(cfg.fpn_repeats):
                feats = BiFPN(cfg.fpn_channels, first_cell=(r == 0),
                              weight_method=cfg.fpn_weight_method,
                              dtype=cfg.dtype, name=f'bifpn{r}')(feats, False)
            return feats

    fpn_keys = ['resample_p6'] + [f'bifpn{r}' for r in
                                  range(cfg.fpn_repeats)]
    fvars = jax.device_put(
        {c: {k: variables[c][k] for k in fpn_keys} for c in variables},
        device)
    fpn = FPNOnly()

    @jax.jit
    def run_fpn(v, c3, c4, c5):
        return fpn.apply(v, c3, c4, c5)

    if 'fpn' in sections:
        ms, comp = _time(run_fpn, fvars, c3, c4, c5)
        flops, hbm = step_cost(run_fpn, fvars, c3, c4, c5)
        results['fpn'] = roofline_row('bifpn_x{}'.format(cfg.fpn_repeats),
                                      BATCH, ms, flops, hbm, device)
        print('fpn: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
              file=sys.stderr, flush=True)

    feats = jax.block_until_ready(run_fpn(fvars, c3, c4, c5))

    # ---- heads ------------------------------------------------------------
    class HeadsOnly(nn.Module):
        @nn.compact
        def __call__(self, feats):
            num_anchors = cfg.anchors_per_cell
            num_cls = cfg.num_class_outputs
            cls_out = _Head(num_anchors * num_cls, cfg.head_repeats,
                            cfg.fpn_channels, dtype=cfg.dtype,
                            name='cls_head')(feats, False)
            box_out = _Head(num_anchors * 4, cfg.head_repeats,
                            cfg.fpn_channels, dtype=cfg.dtype,
                            name='box_head')(feats, False)
            B = feats[0].shape[0]
            boxes = jnp.concatenate(
                [b.reshape(B, -1, 4) for b in box_out], axis=1)
            logits = jnp.concatenate(
                [c.reshape(B, -1, num_cls) for c in cls_out], axis=1)
            return boxes.astype(jnp.float32), logits.astype(jnp.float32)

    hvars = jax.device_put(
        {c: {k: variables[c][k] for k in ('cls_head', 'box_head')}
         for c in variables}, device)
    heads = HeadsOnly()

    @jax.jit
    def run_heads(v, feats):
        return heads.apply(v, feats)

    if 'heads' in sections:
        ms, comp = _time(run_heads, hvars, feats)
        flops, hbm = step_cost(run_heads, hvars, feats)
        results['heads'] = roofline_row('heads', BATCH, ms, flops, hbm,
                                        device)
        print('heads: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
              file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)
    out = os.environ.get('PROFILE_OUT',
                         os.path.join(REPO, 'LITE4_PROFILE.jsonl'))
    with open(out, 'a') as f:
        f.write(json.dumps(results) + '\n')


if __name__ == '__main__':
    main(sys.argv[1:])
