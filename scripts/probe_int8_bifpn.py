"""Probe: do int8 activations pay at BiFPN geometry on v5e?

The round-3 int8 verdict (BENCHMARKS.md) was measured on the SSD300
stack, which runs at ~57% SoL with a ~27% dispatch floor — a regime
where halving activation bytes buys nothing. EfficientDet-Lite4's BiFPN
runs at **94% of peak HBM bandwidth** (LITE4_PROFILE.jsonl), the
opposite regime. This probe times a BiFPN-shaped separable-conv chain
(depthwise 3x3 + pointwise CxC + requant, P3 geometry 80x80x224,
batch 32) in bf16 vs the int8 conv formulation (int8 tensors in HBM,
int32 accumulation, fused requant epilogue) before committing to a full
EfficientDet int8 path.

Timing uses the hardened chained harness (watsor_tpu/timing.py): a
first version of this probe timed repeated identical dispatches and the
tunnel replayed them (bf16 "0.04 ms/step" = 19,000% of speed-of-light —
physically impossible; first rows in LITE4_PROFILE.jsonl, kept for the
record).

    cd /root/repo && timeout 560 python -u - < scripts/probe_int8_bifpn.py
"""

import json
import os
import sys

import numpy as np

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BATCH = int(os.environ.get('BENCH_BATCH', 32))
SIZE = int(os.environ.get('PROBE_SIZE', 80))
CH = int(os.environ.get('PROBE_CH', 224))
DEPTH = int(os.environ.get('PROBE_DEPTH', 8))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from watsor_tpu.roofline import roofline_row, step_cost
    from watsor_tpu.timing import chained_step_ms

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    dn = ('NHWC', 'HWIO', 'NHWC')

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # ---- bf16 chain -------------------------------------------------------
    dw_w = [jnp.asarray(rng.randn(3, 3, 1, CH).astype(np.float32) * 0.1,
                        jnp.bfloat16) for _ in range(DEPTH)]
    pw_w = [jnp.asarray(rng.randn(1, 1, CH, CH).astype(np.float32) * 0.05,
                        jnp.bfloat16) for _ in range(DEPTH)]

    def block_bf16(x):
        for dw, pw in zip(dw_w, pw_w):
            y = lax.conv_general_dilated(x, dw, (1, 1), 'SAME',
                                         feature_group_count=CH,
                                         dimension_numbers=dn)
            y = lax.conv_general_dilated(y, pw, (1, 1), 'SAME',
                                         dimension_numbers=dn)
            x = jnp.minimum(jax.nn.relu(y), jnp.bfloat16(6.0)) + 0.01 * x
        return x

    @jax.jit
    def bf16_run(seed, n):
        key = jax.random.PRNGKey(seed)
        x0 = jax.random.normal(key, (BATCH, SIZE, SIZE, CH), jnp.bfloat16)
        x = lax.fori_loop(0, n, lambda i, x: block_bf16(x), x0)
        return jnp.sum(x.astype(jnp.float32))

    ms, det16 = chained_step_ms(bf16_run, log=lambda m: log('bf16 ' + m))
    x16 = jax.device_put(jnp.zeros((BATCH, SIZE, SIZE, CH), jnp.bfloat16),
                         device)
    flops, hbm = step_cost(jax.jit(block_bf16), x16)
    row16 = roofline_row('bifpn_probe_bf16', BATCH, ms, flops, hbm, device)
    log('bf16: %.2f ms %s' % (ms, json.dumps(row16)))

    # ---- int8 chain (conv formulation: int8 in HBM, int32 acc) ------------
    dw_q = [jnp.asarray(rng.randint(-127, 127, (3, 3, 1, CH)), jnp.int8)
            for _ in range(DEPTH)]
    pw_q = [jnp.asarray(rng.randint(-127, 127, (1, 1, CH, CH)), jnp.int8)
            for _ in range(DEPTH)]
    scale = jnp.float32(1.0 / (127 * 64))

    def block_int8(x):
        for dw, pw in zip(dw_q, pw_q):
            acc = lax.conv_general_dilated(
                x, dw, (1, 1), 'SAME', feature_group_count=CH,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # requant between dw and pw (per-tensor, like ssd_int8)
            y = jnp.clip(jnp.round(acc.astype(jnp.float32) * scale * 127),
                         -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                y, pw, (1, 1), 'SAME', dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            f = jnp.minimum(jax.nn.relu(acc.astype(jnp.float32) * scale),
                            6.0)
            x = jnp.clip(jnp.round(f * (127.0 / 6.0)), -127,
                         127).astype(jnp.int8)
        return x

    @jax.jit
    def int8_run(seed, n):
        key = jax.random.PRNGKey(seed)
        x0 = jax.random.randint(key, (BATCH, SIZE, SIZE, CH), -127, 127,
                                dtype=jnp.int8)
        x = lax.fori_loop(0, n, lambda i, x: block_int8(x), x0)
        return jnp.sum(x.astype(jnp.float32))

    ms8, det8 = chained_step_ms(int8_run, log=lambda m: log('int8 ' + m))
    x8 = jax.device_put(jnp.zeros((BATCH, SIZE, SIZE, CH), jnp.int8), device)
    flops8, hbm8 = step_cost(jax.jit(block_int8), x8)
    row8 = roofline_row('bifpn_probe_int8', BATCH, ms8, flops8, hbm8,
                        device)
    log('int8: %.2f ms %s' % (ms8, json.dumps(row8)))

    out = {'probe': 'bifpn_sepconv_chain', 'harness': 'chained+fresh-seed',
           'batch': BATCH, 'size': SIZE, 'ch': CH, 'depth': DEPTH,
           'bf16': row16, 'int8': row8,
           'bf16_detail': det16, 'int8_detail': det8,
           'speedup_int8_vs_bf16': round(ms / ms8, 3)}
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, 'LITE4_PROFILE.jsonl'), 'a') as fh:
        fh.write(json.dumps(out) + '\n')


main()
