"""Batched on-device box overlay: render every detection of every frame in
one fused program.

The reference draws boxes per frame with cv2 on the host
(/root/reference/watsor/output/draw.py:7-93) — at 32×1080p×30FPS that's a
host bottleneck. TPU-first, a box border is a separable function of the
pixel coordinates: for box n,

    border(y, x) = row_edge[n, y] * col_span[n, x]
                 + row_span[n, y] * col_edge[n, x]

so the whole overlay (all N boxes, color-weighted) is two batched
[H, N] x [N, W] matmuls per channel — MXU work, no gathers, no loops. Text
labels stay host-side (they're small); the hot path is the box geometry.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.config.coco import COCO_COLOR_TABLE


def _edge_and_span(coord_lo, coord_hi, size, thickness):
    """coord_lo/hi: [B, N] pixel box edges -> (edge [B, N, size],
    span [B, N, size]) float32 masks along one axis."""
    idx = jnp.arange(size, dtype=jnp.float32)          # [size]
    lo = coord_lo[..., None]                            # [B, N, 1]
    hi = coord_hi[..., None]
    near_lo = jnp.abs(idx - lo) < thickness
    near_hi = jnp.abs(idx - hi) < thickness
    inside = (idx >= lo - thickness) & (idx <= hi + thickness)
    edge = (near_lo | near_hi) & inside
    return edge.astype(jnp.float32), inside.astype(jnp.float32)


@partial(jax.jit, static_argnames=('thickness',))
def render_boxes(frames_u8, boxes_px, classes, color_table, thickness=2):
    """Draw class-colored box borders into a frame batch.

    frames_u8: [B, H, W, 3] uint8; boxes_px: [B, N, 4] (ymin,xmin,ymax,xmax)
    in pixels; classes: [B, N] int32 (0 = padding, not drawn);
    color_table: [L, 3] uint8 per-label colors.
    Returns the rendered [B, H, W, 3] uint8 batch.
    """
    B, H, W, _ = frames_u8.shape
    valid = (classes > 0).astype(jnp.float32)           # [B, N]

    y_edge, y_span = _edge_and_span(boxes_px[..., 0], boxes_px[..., 2], H,
                                    float(thickness))
    x_edge, x_span = _edge_and_span(boxes_px[..., 1], boxes_px[..., 3], W,
                                    float(thickness))
    y_edge = y_edge * valid[..., None]
    y_span = y_span * valid[..., None]

    colors = color_table[jnp.clip(classes, 0, color_table.shape[0] - 1)]
    colors = colors.astype(jnp.float32)                  # [B, N, 3]

    def channel(c):
        weighted_y_edge = y_edge * colors[..., c:c + 1]   # [B, N, H]
        weighted_y_span = y_span * colors[..., c:c + 1]
        # [B, H, N] @ [B, N, W] -> [B, H, W] on the MXU
        acc = jnp.einsum('bnh,bnw->bhw', weighted_y_edge, x_span,
                         preferred_element_type=jnp.float32)
        acc += jnp.einsum('bnh,bnw->bhw', weighted_y_span, x_edge,
                          preferred_element_type=jnp.float32)
        return acc

    count = jnp.einsum('bnh,bnw->bhw', y_edge, x_span,
                       preferred_element_type=jnp.float32)
    count += jnp.einsum('bnh,bnw->bhw', y_span, x_edge,
                        preferred_element_type=jnp.float32)

    rendered = jnp.stack([channel(c) for c in range(3)], axis=-1)
    count = count[..., None]
    on_border = count > 0.5
    rendered = rendered / jnp.maximum(count, 1.0)        # average overlaps
    out = jnp.where(on_border, rendered, frames_u8.astype(jnp.float32))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def render_detections(frames_u8, boxes_px, classes, thickness=2):
    """Convenience wrapper using the COCO color table."""
    table = jnp.asarray(np.asarray(COCO_COLOR_TABLE, np.uint8))
    return render_boxes(frames_u8, boxes_px, classes, table,
                        thickness=thickness)
