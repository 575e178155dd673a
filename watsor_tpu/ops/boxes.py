"""Box arithmetic: encode/decode against anchors, IoU, areas.

All boxes are ``[y_min, x_min, y_max, x_max]`` in normalized [0, 1]
coordinates (the output contract the reference exposes from its frozen
graphs — boxes are clamped to the frame and converted to pixels at the
edge, /root/reference/watsor/detection/tensorrt_gpu.py:85-88).

Everything here is shape-static, batched and jit-friendly: these ops run
inside the single fused device step, never per-detection in Python (the
reference loops over detections filling ctypes structs,
/root/reference/watsor/detection/edge_tpu.py:45-55 — that loop is exactly
what this module replaces).
"""

import jax.numpy as jnp

# Scale factors of the TF Object Detection API faster_rcnn box coder used by
# every SSD checkpoint the reference consumes (y, x, h, w).
BOX_CODER_SCALES = (10.0, 10.0, 5.0, 5.0)


def anchors_to_center(anchors):
    """[A, 4] ymin/xmin/ymax/xmax -> (ycenter, xcenter, h, w)."""
    ymin, xmin, ymax, xmax = jnp.split(anchors, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    return ymin + 0.5 * h, xmin + 0.5 * w, h, w


def decode_boxes(rel_codes, anchors, scales=BOX_CODER_SCALES):
    """Decode predicted offsets against anchors.

    rel_codes: [..., A, 4] as (ty, tx, th, tw); anchors: [A, 4].
    Returns [..., A, 4] ymin/xmin/ymax/xmax clipped to [0, 1].
    """
    ycenter_a, xcenter_a, ha, wa = anchors_to_center(anchors)
    ty, tx, th, tw = jnp.split(rel_codes, 4, axis=-1)
    ty = ty / scales[0]
    tx = tx / scales[1]
    th = th / scales[2]
    tw = tw / scales[3]
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha
    ycenter = ty * ha + ycenter_a
    xcenter = tx * wa + xcenter_a
    boxes = jnp.concatenate([
        ycenter - 0.5 * h,
        xcenter - 0.5 * w,
        ycenter + 0.5 * h,
        xcenter + 0.5 * w,
    ], axis=-1)
    return jnp.clip(boxes, 0.0, 1.0)


def encode_boxes(boxes, anchors, scales=BOX_CODER_SCALES, eps=1e-8):
    """Inverse of :func:`decode_boxes` (used by the training step)."""
    ycenter_a, xcenter_a, ha, wa = anchors_to_center(anchors)
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = ymax - ymin + eps
    w = xmax - xmin + eps
    ycenter = ymin + 0.5 * h
    xcenter = xmin + 0.5 * w
    ty = (ycenter - ycenter_a) / (ha + eps) * scales[0]
    tx = (xcenter - xcenter_a) / (wa + eps) * scales[1]
    th = jnp.log(h / (ha + eps)) * scales[2]
    tw = jnp.log(w / (wa + eps)) * scales[3]
    return jnp.concatenate([ty, tx, th, tw], axis=-1)


def box_area(boxes):
    """[..., 4] -> [...] area (normalized units)."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU. boxes_a: [..., M, 4], boxes_b: [..., N, 4] ->
    [..., M, N]. Fully vectorized (VPU-friendly, no gathers)."""
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    inter_ymin = jnp.maximum(a[..., 0], b[..., 0])
    inter_xmin = jnp.maximum(a[..., 1], b[..., 1])
    inter_ymax = jnp.minimum(a[..., 2], b[..., 2])
    inter_xmax = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(inter_ymax - inter_ymin, 0.0) * \
        jnp.maximum(inter_xmax - inter_xmin, 0.0)
    union = box_area(boxes_a)[..., :, None] + box_area(boxes_b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-8)
