"""Probe: which int8 formulation reaches the MXU int8 rate on v5e?

Round-1 finding (BENCHMARKS.md): int8 `conv_general_dilated` gives ~2.5%
over bf16 — XLA's int8 conv lowering doesn't hit the MXU int8 rate. This
probe measures, per MobileNetV2-SSD pointwise shape at batch 32:

  a. bf16 matmul (dot_general)            — the baseline formulation
  b. int8 matmul, int32 accum             — plain XLA dot_general
  c. int8 matmul + requant epilogue (XLA) — what the model actually needs
  d. int8 1x1 conv (current ssd_int8.py formulation)
  e. Pallas int8 matmul with fused requant epilogue (int8 in, int8 out)

Timing protocol (tunnel-proof): each op runs inside a jitted
lax.fori_loop whose body chains a CHEAP 32-row update of the input (so
the matmul can't be hoisted), and the per-iteration time is the
DIFFERENCE between a long and a short loop — per-call tunnel latency and
dispatch cost cancel exactly.

Writes /tmp/int8_probe.json.
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO = int(os.environ.get('PROBE_LO', 50))
HI = int(os.environ.get('PROBE_HI', 350))
REPEATS = 5

# (M, K, N): batch-32 MobileNetV2-SSD pointwise workloads
SHAPES = [
    (32 * 75 * 75, 96, 24),      # block2 project (big M, skinny)
    (32 * 38 * 38, 192, 64),     # mid-stack project
    (32 * 38 * 38, 64, 384),     # mid-stack expand
    (32 * 19 * 19, 576, 160),    # deep project
    (32 * 19 * 19, 160, 960),    # deep expand
    (32 * 10 * 10, 1280, 512),   # extra features
]


def _loop_time(make_loop, x, *args):
    """Per-iteration seconds via long-short differencing."""
    import jax
    f_lo = make_loop(LO)
    f_hi = make_loop(HI)
    jax.block_until_ready(f_lo(x, *args))
    jax.block_until_ready(f_hi(x, *args))
    best = float('inf')
    for _ in range(REPEATS):
        t = perf_counter()
        jax.block_until_ready(f_lo(x, *args))
        t_lo = perf_counter() - t
        t = perf_counter()
        jax.block_until_ready(f_hi(x, *args))
        t_hi = perf_counter() - t
        best = min(best, (t_hi - t_lo) / (HI - LO))
    return max(best, 1e-9)


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

        def chain_f(x, y):
            # cheap non-simplifiable update of 32 rows
            slab = x[:32] + y[:32].sum(axis=1, keepdims=True) \
                .astype(x.dtype) * jnp.asarray(2e-3, x.dtype)
            return lax.dynamic_update_slice(x, slab, (0, 0))

        def chain_i(x, y):
            slab = x[:32] ^ y[:32].sum(axis=1, keepdims=True) \
                .astype(jnp.int8)
            return lax.dynamic_update_slice(x, slab, (0, 0))

        def make(body_fn, chain):
            def factory(iters):
                @jax.jit
                def run(x, *args):
                    def body(_, x):
                        return chain(x, body_fn(x, *args))
                    return lax.fori_loop(0, iters, body, x)
                return run
            return factory

        bf16 = make(lambda x, w: lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), chain_f)

        int8_dot = make(lambda x, w: lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), chain_i)

        def requant_body(x, w):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * wscale + bias
            y = jnp.clip(y, 0.0, 6.0)
            return jnp.clip(jnp.round(y / 0.047), -127.0, 127.0) \
                .astype(jnp.int32)

        int8_req = make(requant_body, chain_i)

        t_bf16 = _loop_time(bf16, x_f, w_f)
        t_dot = _loop_time(int8_dot, x_i, w_i)
        t_req = _loop_time(int8_req, x_i, w_i)

        # d. the conv formulation (current ssd_int8.py)
        H = int(round((M // 32) ** 0.5))
        x_c = x_i.reshape(32, H, H, K)
        w_c = w_i.reshape(1, 1, K, N)

        def conv_body(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)

        def chain_c(x, y):
            slab = x[:1] ^ y[:1].sum(axis=3, keepdims=True) \
                .astype(jnp.int8)
            return lax.dynamic_update_slice(x, slab, (0, 0, 0, 0))

        t_conv = _loop_time(make(conv_body, chain_c), x_c, w_c)

        # e. Pallas fused int8 matmul + requant (int8 in, int8 out)
        t_pl = None
        try:
            from watsor_tpu.ops.int8_matmul import int8_matmul_requant

            def pallas_body(x, w):
                return int8_matmul_requant(x, w, wscale, bias,
                                           out_scale=0.047)

            t_pl = _loop_time(make(pallas_body, chain_i), x_i, w_i)
        except Exception as exc:
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
            'pallas_tops': round(flops / t_pl / 1e12, 1) if t_pl else None,
        }
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open('/tmp/int8_probe.json', 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
