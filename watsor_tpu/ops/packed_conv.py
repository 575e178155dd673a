"""Space-to-depth ("packed") execution of early backbone stages.

Why: TPU vector memory tiles the minor (feature) axis to 128 lanes, so a
high-resolution activation with few channels is stored — and streamed —
padded: the measured Lite4 stem reads its 640x640x3 input as 640x640x128
(104.7 MB/frame, LITE4_PROFILE.jsonl) and the whole 320px region runs at
~49% of HBM speed-of-light from the same effect (channels 24/32/144
against the 128-lane tile). The classic TPU fix (used by MLPerf ResNet
and description in the public scaling playbooks) is to re-express the
early layers on a space-to-depth transformed tensor: a 2x2 spatial block
folds into the channel axis, quadrupling channel counts (3->12, 24->96,
32->128, 144->576) so the lane tile is actually full, while every conv
is re-written — exactly, not approximately — against transformed
weights:

  * 1x1 (pointwise) convs mix only the true channel ``c`` of each
    virtual pixel, so on the packed layout they become a block-diagonal
    1x1 conv: ``kron(W, I_4)`` in the c-major packed channel order.
  * kxk depthwise convs become grouped convs over the packed grid: each
    virtual output pixel (parity d_out) reads virtual taps that land on
    a bounded window of packed pixels with per-tap input parity d_in, so
    the kernel scatters into a [PK, PK, 4, 4C] grouped-conv kernel
    (feature_group_count=C, 4-in/4-out per group).
  * the dense stem conv scatters the same way without the grouping.

Stride-2 convs consume one level of packing on the virtual grid but the
output is kept packed at the new resolution (the packed grid halves),
so the whole stem..stage2 region of EfficientNet-Lite runs packed and
unpacks once at stride 8 where channel counts reach the lane width.

All transforms are exact re-associations of the same multiply-adds;
outputs match the unpacked modules to float tolerance (pinned in
tests/test_packed_conv.py).

Packed channel order is **c-major**: packed channel = c*4 + dy*2 + dx.
This keeps depthwise groups contiguous (feature_group_count semantics)
and makes BatchNorm parameters a plain ``repeat(p, 4)``.

The reference has no analog (its accelerators run opaque TFLite/TRT
binaries, /root/reference/watsor/detection/tensorflow_lite_cpu.py) —
this is TPU-first performance engineering on top of reference parity.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with c-major packed channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> [B, H/2, W/2, C, dy, dx] so channel index = c*4 + dy*2 + dx
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, 2 * h, 2 * w, c)


def same_pad_lo(size, kernel, stride):
    """TF/Flax 'SAME' low padding for one spatial dim."""
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    return total // 2


@lru_cache(maxsize=None)
def _tap_table(kernel, stride, lo_v):
    """Static map of virtual conv taps onto the packed grid.

    For output parity d_out in {0,1} and virtual kernel offset k in
    [0, kernel): the virtual input row is ``stride*d_out + k - lo_v``
    relative to twice the packed output position, which lands on packed
    offset ``a`` (may be negative) with input parity ``p``.

    Returns (offsets, a_min, extent) where offsets[(d_out, k)] = (a, p).
    """
    offsets = {}
    for d_out in (0, 1):
        for k in range(kernel):
            r = stride * d_out + k - lo_v
            a = r // 2          # floor division: correct for negative r
            p = r - 2 * a
            offsets[(d_out, k)] = (a, p)
    a_min = min(a for a, _ in offsets.values())
    a_max = max(a for a, _ in offsets.values())
    return offsets, a_min, a_max - a_min + 1


@lru_cache(maxsize=None)
def _scatter_map(kernel, stride, lo_v):
    """Constant M[PK, 4->d_in, 4->d_out, k] per spatial dim is awkward;
    build the joint 2-D map instead: M[PKh, PKw, d_in, d_out, kh, kw]
    with 0/1 entries marking which virtual tap lands where. numpy
    constant — folded at trace time."""
    offs, a_min, extent = _tap_table(kernel, stride, lo_v)
    m = np.zeros((extent, extent, 4, 4, kernel, kernel), np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            d_out = dy * 2 + dx
            for ky in range(kernel):
                ay, py = offs[(dy, ky)]
                for kx in range(kernel):
                    ax, px = offs[(dx, kx)]
                    m[ay - a_min, ax - a_min, py * 2 + px, d_out, ky, kx] = 1.0
    return m, a_min, extent


def _packed_padding(in_packed, out_packed, packed_stride, a_min, extent):
    lo = -a_min
    hi = (out_packed - 1) * packed_stride + extent - in_packed - lo
    return (lo, hi)


def packed_depthwise(x, w, virtual_stride, virtual_size):
    """Depthwise kxk conv on a packed tensor.

    Args:
      x: [B, hp, wp, 4C] packed activations (virtual grid 2*hp x 2*wp).
      w: [kh, kw, 1, C] flax depthwise kernel.
      virtual_stride: 1 or 2 (the original conv's stride).
      virtual_size: virtual spatial size (2*hp), for SAME padding.
    Returns packed output [B, hp', wp', 4C] (hp'=hp for stride 1,
    hp/2 for stride 2).
    """
    kh, kw, _, c = w.shape
    assert kh == kw, 'square kernels only'
    lo_v = same_pad_lo(virtual_size, kh, virtual_stride)
    m, a_min, extent = _scatter_map(kh, virtual_stride, lo_v)
    # rhs[P, Q, d_in, c*4 + d_out] = sum_{ky,kx} M[..] * w[ky,kx,0,c]
    rhs = jnp.einsum('PQiohw,hwc->PQico', jnp.asarray(m, x.dtype),
                     w[:, :, 0, :].astype(x.dtype))
    rhs = rhs.reshape(extent, extent, 4, 4 * c)
    in_packed = x.shape[1]
    out_packed = in_packed if virtual_stride == 1 else in_packed // 2
    pad = _packed_padding(in_packed, out_packed, virtual_stride,
                          a_min, extent)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(virtual_stride, virtual_stride),
        padding=(pad, pad), feature_group_count=c,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def packed_dense(x, w, virtual_stride, virtual_size):
    """Dense kxk conv on a packed tensor (the stem).

    Args:
      x: [B, hp, wp, 4*Cin] packed.
      w: [kh, kw, Cin, Cout] flax kernel.
    Returns packed [B, hp', wp', 4*Cout].
    """
    kh, kw, cin, cout = w.shape
    assert kh == kw, 'square kernels only'
    lo_v = same_pad_lo(virtual_size, kh, virtual_stride)
    m, a_min, extent = _scatter_map(kh, virtual_stride, lo_v)
    # rhs[P, Q, cin*4+d_in, cout*4+d_out]
    rhs = jnp.einsum('PQiohw,hwcd->PQcido', jnp.asarray(m, x.dtype),
                     w.astype(x.dtype))
    rhs = rhs.reshape(extent, extent, 4 * cin, 4 * cout)
    in_packed = x.shape[1]
    out_packed = in_packed if virtual_stride == 1 else in_packed // 2
    pad = _packed_padding(in_packed, out_packed, virtual_stride,
                          a_min, extent)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(virtual_stride, virtual_stride),
        padding=(pad, pad),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def packed_pointwise(x, w):
    """1x1 dense conv on a packed tensor: block-diagonal kron(W, I4).

    Args:
      x: [B, hp, wp, 4*Cin]; w: [1, 1, Cin, Cout] or [Cin, Cout].
    """
    if w.ndim == 4:
        w = w[0, 0]
    cin, cout = w.shape
    wp = jnp.kron(w.astype(x.dtype), jnp.eye(4, dtype=x.dtype))
    return jnp.einsum('bhwc,cd->bhwd', x, wp)


def packed_bn(x, scale, bias, mean, var, eps=1e-3, relu6=True):
    """Inference BatchNorm (+ optional ReLU6) with packed (repeated 4x)
    per-channel parameters, matching ConvBN's arithmetic."""
    factor = (scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    shift = (bias - mean * scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = x * jnp.repeat(factor, 4) + jnp.repeat(shift, 4)
    if relu6:
        y = jnp.minimum(jax.nn.relu(y), 6.0)
    return y
