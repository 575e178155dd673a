"""Fused MobileNetV2 inverted-residual block as a Pallas TPU kernel.

XLA runs expand (1x1), depthwise 3x3 and project (1x1) as three separate
convolutions, round-tripping the 6x-expanded activation through HBM twice
per block (~1 GB/step at batch 32 across the network — the forward is
memory-bound, BENCHMARKS.md). This kernel keeps the expanded tensor in
VMEM for a tile of rows: one DMA of the input rows (+1 halo each side),
expand as a single MXU matmul over [rows*W, C_in], the 3x3 depthwise as
nine shifted multiply-adds on the VPU, project as a row-batched matmul,
optional residual add — HBM sees only the block's (small) input and
output.

Scope: stride-1 blocks with an expand stage (12 of MobileNetV2's 17);
stride-2 blocks stay on XLA. BatchNorm is pre-folded into weights/biases
(models/ssd_int8.fold_unit). Guide: /opt/skills/guides/pallas_guide.md.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _row_tile(h):
    """Output rows per grid step: whole map when small, else ~16."""
    return h if h <= 24 else 16


@partial(jax.jit, static_argnames=('residual', 'interpret'))
def fused_inverted_residual(x, we, be, wdw, bdw, wp, bp, residual=False,
                            interpret=False):
    """x [B, H, W, C_in] (any float dtype), folded weights:
    we [C_in, E], be [E]; wdw [3, 3, E], bdw [E]; wp [E, C_out], bp [C_out].
    Returns [B, H, W, C_out] in x.dtype. relu6 after expand and depthwise,
    linear project, residual add when requested (requires C_out == C_in).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    E = we.shape[1]
    C_out = wp.shape[1]
    R = _row_tile(H)
    n_tiles = -(-H // R)

    we = we.astype(jnp.bfloat16)
    wdw = wdw.astype(jnp.bfloat16)
    wp = wp.astype(jnp.bfloat16)
    be = be.astype(jnp.float32)
    bdw = bdw.astype(jnp.float32)
    bp = bp.astype(jnp.float32)

    def kernel(x_ref, we_ref, be_ref, wdw_ref, bdw_ref, wp_ref, bp_ref,
               out_ref):
        t = pl.program_id(1)
        # x block arrives with halo rows (the wrapper pre-pads and
        # pre-gathers overlapping tiles; pad rows are zero)
        xt = x_ref[0, 0].astype(jnp.bfloat16)               # [R+2, W, C]

        # expand: per-row MXU contractions over channels (Mosaic can't
        # shape-cast a rank-3 dot operand; rows are cheap to unroll)
        e_rows = []
        for r in range(R + 2):
            er = jnp.dot(xt[r], we_ref[:],
                         preferred_element_type=jnp.float32)  # [W, E]
            e_rows.append(jnp.clip(er + be_ref[:], 0.0, 6.0)
                          .astype(jnp.bfloat16))
        e = jnp.stack(e_rows)                               # [R+2, W, E]

        # depthwise 3x3, stride 1, SAME: nine shifted multiply-adds.
        # Row taps come from the halo; column taps shift the W (sublane)
        # axis with edge masking.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        acc = jnp.zeros((R, W, E), jnp.float32)
        first_row = t * R
        for dr in range(3):
            rows = e[dr:dr + R]                             # [R, W, E]
            # rows outside the image (top/bottom SAME padding) are zero
            row_index = first_row + dr - 1 + \
                jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
            row_ok = (row_index >= 0) & (row_index < H)
            # Mosaic's rotate only handles 32-bit lanes: tap in f32
            rows = jnp.where(row_ok, rows, 0).astype(jnp.float32)
            for dc in range(3):
                # pltpu.roll requires non-negative shifts: W-1 == -1 mod W
                shifted = rows if dc == 1 else \
                    pltpu.roll(rows, (1 - dc) % W, 1)
                col_ok = (col + dc - 1 >= 0) & (col + dc - 1 < W)
                tap = jnp.where(col_ok, shifted, 0.0)
                acc = acc + tap * wdw_ref[dr, dc].astype(jnp.float32)
        d = jnp.clip(acc + bdw_ref[:], 0.0, 6.0).astype(jnp.bfloat16)

        # project back down: per-row MXU contractions over E
        p_rows = []
        for r in range(R):
            pr = jnp.dot(d[r], wp_ref[:],
                         preferred_element_type=jnp.float32)  # [W, C_out]
            p_rows.append(pr + bp_ref[:])
        p = jnp.stack(p_rows)                               # [R, W, C_out]
        if residual:
            p = p + xt[1:1 + R].astype(jnp.float32)
        out_ref[0, 0] = p.astype(out_ref.dtype)

    # pre-pad rows by 1 on each side so every tile's halo is a plain
    # block read (pad rows are masked in-kernel anyway; also pad the
    # bottom so the last tile is full)
    pad_bottom = n_tiles * R + 1 - H
    xp = jnp.pad(x, ((0, 0), (1, pad_bottom), (0, 0), (0, 0)))
    # view as overlapping tiles: tile t = rows [t*R, t*R + R + 2) of xp.
    # BlockSpec blocks cannot overlap, so gather the tiles explicitly —
    # XLA lowers this to a cheap strided copy once per step.
    tiles = jnp.stack([
        jax.lax.dynamic_slice_in_dim(xp, t * R, R + 2, axis=1)
        for t in range(n_tiles)], axis=1)                   # [B, T, R+2, W, C]

    grid_spec = pl.GridSpec(
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, R + 2, W, C),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, W, C_out),
            lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, R, W, C_out), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tiles, we, be, wdw, bdw, wp, bp)
    out = out.reshape(B, n_tiles * R, W, C_out)[:, :H]
    return out
