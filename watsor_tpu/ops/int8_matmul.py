"""Fused int8 matmul + requantization epilogue (Pallas, MXU int8 rate).

The EdgeTPU-parity quantization lever (VERDICT round-1 #4): XLA's int8
`conv_general_dilated` lowering does not reach the MXU int8 rate
(BENCHMARKS.md round 2, ~2.5% over bf16). MobileNetV2's hot convs are
1x1 pointwise = plain matmuls; this kernel runs them as int8 MXU
contractions with the whole dequant->bias->relu6->requant epilogue fused
into the tile while it is still in VMEM — int8 in, int8 out, so HBM
traffic is 1/4 of the f32-out formulation and no separate requant pass
exists.

The requant divide is pre-folded into the per-channel scale/bias vectors
(so calibration scales may be traced values): with ``q = 1/out_scale``,

    int8_out = clip(round(clip(acc*s + b, 0, 6) * q), -127, 127)
             = clip(round(clip(acc*(s*q) + b*q, 0, 6*q)), -127, 127)

Replaces (for pointwise units) the reference's delegation of int8 compute
to libedgetpu (/root/reference/watsor/detection/edge_tpu.py:13-20).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _requant_kernel(x_ref, w_ref, scale_ref, bias_ref, hi_ref, out_ref, *,
                    relu6):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if relu6:
        y = jnp.clip(y, 0.0, hi_ref[0, 0])
    y = jnp.round(y)
    out_ref[:] = jnp.clip(y, -127.0, 127.0).astype(jnp.int8)


def _float_kernel(x_ref, w_ref, scale_ref, bias_ref, hi_ref, out_ref, *,
                  relu6):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if relu6:
        y = jnp.clip(y, 0.0, hi_ref[0, 0])
    out_ref[:] = y


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('quantize_out', 'relu6',
                                             'block_m', 'block_n',
                                             'interpret'))
def _call(x_i8, w_i8, scale, bias, hi, quantize_out, relu6, block_m,
          block_n, interpret):
    M, K = x_i8.shape
    N = w_i8.shape[1]
    x_p = _pad_to(_pad_to(x_i8, 1, 128), 0, block_m)
    w_p = _pad_to(_pad_to(w_i8, 0, 128), 1, block_n)
    scale_p = _pad_to(scale.reshape(1, -1).astype(jnp.float32), 1, block_n)
    bias_p = _pad_to(bias.reshape(1, -1).astype(jnp.float32), 1, block_n)
    hi_p = jnp.asarray(hi, jnp.float32).reshape(1, 1)
    Mp, Kp = x_p.shape
    Np = w_p.shape[1]
    grid = (Mp // block_m, Np // block_n)

    kernel = functools.partial(
        _requant_kernel if quantize_out else _float_kernel, relu6=relu6)
    out_dtype = jnp.int8 if quantize_out else jnp.float32

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(Mp) * int(Kp) * int(Np),
            bytes_accessed=int(Mp) * int(Kp) + int(Kp) * int(Np) +
            int(Mp) * int(Np),
            transcendentals=0),
        interpret=interpret,
    )(x_p, w_p, scale_p, bias_p, hi_p)
    return out[:M, :N]


def int8_matmul_requant(x_i8, w_i8, scale, bias, out_scale=None,
                        relu6=True, block_m=512, block_n=256,
                        interpret=False):
    """y = requant(relu6(int8(x) @ int8(w) * scale + bias)).

    x_i8 [M, K] int8; w_i8 [K, N] int8; scale [N] f32 is the combined
    x_scale * per-channel w_scale; bias [N] f32; ``out_scale`` (scalar,
    may be traced) makes the result int8; None keeps f32 (for residual
    adds / head features).
    """
    if out_scale is not None:
        inv = 1.0 / jnp.asarray(out_scale, jnp.float32)
        return _call(x_i8, w_i8, scale * inv, bias * inv, 6.0 * inv,
                     True, relu6, block_m, block_n, interpret)
    return _call(x_i8, w_i8, scale, bias, 6.0, False, relu6, block_m,
                 block_n, interpret)


def reference_requant(x_i8, w_i8, scale, bias, out_scale=None, relu6=True):
    """Plain-jnp semantics the kernel must match (tests)."""
    y = jax.lax.dot_general(x_i8, w_i8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale.reshape(1, -1) + bias.reshape(1, -1)
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    if out_scale is None:
        return y
    return jnp.clip(jnp.round(y / out_scale), -127.0, 127.0) \
        .astype(jnp.int8)
