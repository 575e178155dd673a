"""Probe: which int8 formulation reaches the MXU int8 rate on v5e?

Round-1 finding (BENCHMARKS.md): int8 `conv_general_dilated` gives ~2.5%
over bf16 — XLA's int8 conv lowering doesn't hit the MXU int8 rate. This
probe measures, per MobileNetV2-SSD pointwise shape at batch 32:

  a. bf16 matmul (dot_general)            — the baseline formulation
  b. int8 matmul, int32 accum             — plain XLA dot_general
  c. int8 matmul + requant epilogue (XLA) — what the model actually needs
  d. int8 1x1 conv (current ssd_int8.py formulation)
  e. Pallas int8 matmul with fused requant epilogue (int8 in, int8 out)

Timing protocol: each op is iterated inside ONE jitted lax.fori_loop with
a data dependency (output feeds a cheap update of the input), so the
per-step dispatch floor of this rig's tunnel amortizes away.

Writes /tmp/int8_probe.json.
"""

import json
import os
import sys
from functools import partial
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get('PROBE_ITERS', 50))
REPEATS = 3

# (M, K, N): batch-32 MobileNetV2-SSD pointwise workloads
# M = B*H*W of the feature map feeding the 1x1 conv
SHAPES = [
    (32 * 75 * 75, 96, 24),      # block2 project-ish (big M, skinny)
    (32 * 38 * 38, 192, 64),     # mid-stack project
    (32 * 38 * 38, 64, 384),     # mid-stack expand
    (32 * 19 * 19, 576, 160),    # deep project
    (32 * 19 * 19, 160, 960),    # deep expand
    (32 * 10 * 10, 1280, 512),   # extra features
]


def _time(fn, *args):
    import jax
    out = jax.block_until_ready(fn(*args))   # compile
    best = float('inf')
    for _ in range(REPEATS):
        t = perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, perf_counter() - t)
    return best / ITERS, out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print('device:', dev.device_kind, file=sys.stderr, flush=True)
    results = []

    for (M, K, N) in SHAPES:
        rng = np.random.default_rng(0)
        x_f = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w_f = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        x_i = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        w_i = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        wscale = jnp.asarray(rng.uniform(1e-3, 2e-3, (N,)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((N,)), jnp.float32)

        # every variant: y depends on x via a cheap chained update so the
        # loop body can't be hoisted/DCE'd
        @jax.jit
        def bf16_loop(x, w):
            def body(_, x):
                y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return (x + y[:, :1].astype(jnp.bfloat16) * 1e-6)
            return lax.fori_loop(0, ITERS, body, x)

        @jax.jit
        def int8_dot_loop(x, w):
            def body(_, x):
                y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                return x ^ y[:, :1].astype(jnp.int8)
            return lax.fori_loop(0, ITERS, body, x)

        @jax.jit
        def int8_requant_loop(x, w):
            def body(_, x):
                y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * wscale + bias
                y = jnp.clip(y, 0.0, 6.0)
                y_i8 = jnp.clip(jnp.round(y / 0.047), -127.0, 127.0) \
                    .astype(jnp.int8)
                return x ^ y_i8[:, :1]
            return lax.fori_loop(0, ITERS, body, x)

        t_bf16, _ = _time(bf16_loop, x_f, w_f)
        t_dot, _ = _time(int8_dot_loop, x_i, w_i)
        t_req, _ = _time(int8_requant_loop, x_i, w_i)

        # d. the conv formulation (current ssd_int8.py)
        H = int(round((M // 32) ** 0.5))
        x_c = x_i.reshape(32, H, H, K)
        w_c = w_i.reshape(1, 1, K, N)

        @jax.jit
        def int8_conv_loop(x, w):
            def body(_, x):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.int32)
                return x ^ y[..., :1].astype(jnp.int8)
            return lax.fori_loop(0, ITERS, body, x)

        t_conv, _ = _time(int8_conv_loop, x_c, w_c)

        # e. Pallas fused int8 matmul + requant (int8 in, int8 out)
        t_pl = None
        try:
            from watsor_tpu.ops.int8_matmul import int8_matmul_requant

            @jax.jit
            def pallas_loop(x, w):
                def body(_, x):
                    y = int8_matmul_requant(x, w, wscale, bias,
                                            out_scale=0.047)
                    return x ^ y[:, :1]
                return lax.fori_loop(0, ITERS, body, x)

            t_pl, _ = _time(pallas_loop, x_i, w_i)
        except Exception as exc:    # kernel may not exist yet
            print('pallas variant skipped: {}'.format(exc),
                  file=sys.stderr, flush=True)

        flops = 2.0 * M * K * N
        row = {
            'shape': [M, K, N],
            'bf16_us': round(t_bf16 * 1e6, 1),
            'int8_dot_us': round(t_dot * 1e6, 1),
            'int8_requant_us': round(t_req * 1e6, 1),
            'int8_conv_us': round(t_conv * 1e6, 1),
            'pallas_us': round(t_pl * 1e6, 1) if t_pl else None,
            'bf16_tflops': round(flops / t_bf16 / 1e12, 1),
            'int8_dot_tops': round(flops / t_dot / 1e12, 1),
        }
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open('/tmp/int8_probe.json', 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
