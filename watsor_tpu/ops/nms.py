"""Fixed-shape, batched, class-aware non-maximum suppression.

The reference receives NMS for free inside its frozen TF graph / TensorRT
``NMS`` plugin (output layout documented at
/root/reference/watsor/detection/tensorrt_gpu.py:184-188: per-image
[num, boxes, scores, classes]). On TPU we own it, and it must compile to a
static-shape XLA program: no data-dependent shapes, no host synchronization.

Design:
  1. per class, keep the top ``k`` candidates by score (``lax.top_k``);
  2. greedy suppression over the sorted candidates expressed as a
     ``fori_loop`` of k steps over a [*, k] keep-mask — each step is a pure
     vector op batched over (batch × class), so the VPU sees large tiles and
     the MXU-free loop costs microseconds;
  3. merge all classes and keep the global top ``max_detections``.

A fully-parallel "fast" mode (Bonneel/Yolact-style: keep i unless a
higher-scored j overlaps it) removes the loop entirely at the cost of
slightly more aggressive suppression.
"""

from functools import partial

import jax
import jax.numpy as jnp

from watsor_tpu.ops.boxes import iou_matrix


def _per_class_topk(scores, k):
    """scores [B, A, C] -> (top scores [B, C, k], indices [B, C, k])."""
    scores_cf = jnp.transpose(scores, (0, 2, 1))  # [B, C, A]
    return jax.lax.top_k(scores_cf, k)


def _greedy_keep(iou, iou_threshold, k):
    """iou: [..., k, k] of score-sorted boxes -> keep mask [..., k] (bool).

    Exact greedy NMS: walk candidates in score order; candidate i survives
    unless a surviving higher-scored candidate overlaps it beyond the
    threshold. The loop is over k only; all batch dims ride inside each step.
    """
    col = jnp.arange(k)

    def body(i, keep):
        # suppress every later box that overlaps box i, if box i survived
        iou_i = jax.lax.dynamic_index_in_dim(iou, i, axis=-2, keepdims=False)
        keep_i = jax.lax.dynamic_index_in_dim(keep, i, axis=-1, keepdims=True)
        overlaps = iou_i > iou_threshold                    # [..., k]
        later = col > i                                     # [k]
        suppress = overlaps & later & keep_i
        return keep & ~suppress

    keep0 = jnp.ones(iou.shape[:-1], dtype=bool)
    return jax.lax.fori_loop(0, k, body, keep0)


def _fast_keep(iou, iou_threshold):
    """Parallel approximation: keep i if no higher-scored box overlaps it."""
    upper = jnp.triu(iou, k=1)  # iou[j, i] for j < i lives above the diagonal
    max_prev = jnp.max(upper, axis=-2)
    return max_prev <= iou_threshold


@partial(jax.jit, static_argnames=('max_detections', 'union_m',
                                   'suppression'))
def batched_class_aware_nms_fused(boxes, scores,
                                  iou_threshold=0.6,
                                  score_threshold=0.005,
                                  max_detections=100,
                                  union_m=128,
                                  suppression='fast'):
    """Gather-free class-aware NMS (the TPU fast path).

    The top_k/suppression math of the classic formulation is nearly free on
    TPU; what costs milliseconds is gathering per-class candidate boxes
    ([B, C, k] indices into [B, A, 4] — measured 5+ ms of a 6.6 ms post
    stage at B=32). This formulation never builds per-class box sets:

      1. one class-AGNOSTIC candidate union: top ``union_m`` anchors by
         max-class score (a single small gather);
      2. one shared IoU matrix [B, M, M] over the union;
      3. suppression for ALL classes at once — an elementwise compare
         broadcast over [B, C, M, M] that XLA fuses straight into the
         reduction, so the 4-D tensor never hits HBM. Two semantics:
         ``suppression='fast'``: candidate i of class c is kept unless ANY
         higher-scoring same-class candidate overlaps it (Fast-NMS — a
         suppressed candidate still suppresses, over-aggressive on chains);
         ``suppression='greedy'``: the same cheap step iterated to its
         fixed point with a while_loop — candidate i is kept unless a KEPT
         higher-scoring candidate overlaps it. The fixed point is exactly
         the classic greedy-NMS solution (the suppressor relation is a DAG
         ordered by score, and Jacobi iteration settles nodes in
         topological-depth order, so it terminates in chain-depth steps —
         2-4 in real scenes). Greedy semantics at fused cost.
      4. final top-k over [B, C*M]; boxes come from the union by one tiny
         gather, classes by integer arithmetic (no gather at all).

    Returns the same (boxes, scores, classes, valid) contract as
    :func:`batched_class_aware_nms`.
    """
    B, A, C = scores.shape
    M = min(union_m, A)

    # 1. class-agnostic candidate union
    best_score = jnp.max(scores, axis=-1)                    # [B, A]
    _, union_idx = jax.lax.top_k(best_score, M)              # [B, M]
    union_boxes = jnp.take_along_axis(boxes, union_idx[..., None], axis=1)
    union_scores = jnp.take_along_axis(scores, union_idx[..., None], axis=1)
    # -> [B, M, C] ; transpose to class-major for the suppression broadcast
    s = jnp.transpose(union_scores, (0, 2, 1))               # [B, C, M]
    return _fused_suppress_merge(union_boxes, s, iou_threshold,
                                 score_threshold, max_detections,
                                 suppression)


@partial(jax.jit, static_argnames=('scales', 'max_detections', 'union_m',
                                   'suppression'))
def batched_class_aware_nms_fused_late(box_enc, logits, anchors,
                                       scales,
                                       iou_threshold=0.6,
                                       score_threshold=0.005,
                                       max_detections=100,
                                       union_m=128,
                                       suppression='fast'):
    """:func:`batched_class_aware_nms_fused` with LATE materialization.

    Identical results, radically less HBM traffic at EfficientDet scale:
    instead of decoding all A anchors ([B, A, 4] f32) and materializing
    the full sigmoid score tensor ([B, A, C]) only for the union top-k to
    discard all but M=128 rows, this variant ranks the union on the raw
    max-class LOGIT (sigmoid is monotonic, so the top-M set and its
    tie-break order are the same), then gathers the M surviving rows of
    ``box_enc``/``logits``/``anchors`` and runs decode + sigmoid on
    [B, M, ...] shapes. decode/sigmoid are elementwise, so op-then-gather
    and gather-then-op produce bitwise-identical values; every downstream
    number matches the eager formulation. At Lite4 scale
    (A=76,725 × C=91) this removes ~2 GB of per-step intermediate traffic
    from the post stage.

    Args:
      box_enc: [B, A, 4] raw box regression (any float dtype).
      logits:  [B, A, C] pre-sigmoid class logits, background removed.
      anchors: [A, 4] ymin/xmin/ymax/xmax anchor table.
      scales:  box-coder scale 4-tuple (static).
    """
    from watsor_tpu.ops.boxes import decode_boxes

    B, A, C = logits.shape
    M = min(union_m, A)

    best_logit = jnp.max(logits, axis=-1)                    # [B, A]
    _, union_idx = jax.lax.top_k(best_logit, M)              # [B, M]
    union_enc = jnp.take_along_axis(box_enc, union_idx[..., None], axis=1)
    union_logits = jnp.take_along_axis(logits, union_idx[..., None], axis=1)
    union_anchors = jnp.take(anchors, union_idx, axis=0)     # [B, M, 4]
    union_boxes = decode_boxes(union_enc.astype(jnp.float32),
                               union_anchors, scales=scales)
    # sigmoid in f32: [B, M, C] is tiny, and f32 scores keep suppression
    # ties/thresholds at full precision even when the logits are bf16
    # (bf16 sigmoid would collide distinct logits into equal scores)
    s = jnp.transpose(
        jax.nn.sigmoid(union_logits.astype(jnp.float32)), (0, 2, 1))
    return _fused_suppress_merge(union_boxes, s, iou_threshold,
                                 score_threshold, max_detections,
                                 suppression)


def _fused_suppress_merge(union_boxes, s, iou_threshold, score_threshold,
                          max_detections, suppression):
    """Steps 2-4 of the fused NMS: suppression over the candidate union
    ([B, M, 4] boxes, [B, C, M] class-major scores) and the class merge."""
    B, C, M = s.shape

    # 2. one shared IoU matrix
    iou = iou_matrix(union_boxes, union_boxes)               # [B, M, M]
    overlap = (iou > iou_threshold)[:, None, :, :]           # [B, 1, M, M]

    # 3. all-class suppression, fused compare+reduce. higher[b,c,i,j] means
    # candidate i outranks candidate j for class c (score, index tiebreak).
    idx = jnp.arange(M)
    higher = (s[:, :, :, None] > s[:, :, None, :]) | \
        ((s[:, :, :, None] == s[:, :, None, :]) &
         (idx[None, None, :, None] < idx[None, None, None, :]))
    if suppression == 'greedy_pallas':
        # VMEM-resident fixed point: the whole Jacobi iteration runs
        # inside one kernel per image instead of relaunching an XLA
        # while_loop body. Selected STATICALLY (mode='fused_exact_pallas')
        # — an env flag read at trace time would be frozen into the jit
        # cache and silently ignored on later toggles.
        from watsor_tpu.ops.nms_pallas import fixed_point_suppress
        keep = fixed_point_suppress(s, iou, iou_threshold=iou_threshold)
        suppressed = ~keep
    elif suppression == 'greedy':
        def cond(state):
            _, changed = state
            return changed

        def body(state):
            keep, _ = state
            # i suppresses j only while i itself is kept
            suppressed = jnp.any(
                higher & overlap & keep[:, :, :, None],
                axis=2)                                      # [B, C, M]
            new_keep = ~suppressed
            return new_keep, jnp.any(new_keep != keep)

        keep0 = jnp.ones(s.shape, dtype=bool)
        keep, _ = jax.lax.while_loop(cond, body,
                                     (keep0, jnp.bool_(True)))
        suppressed = ~keep
    else:
        suppressed = jnp.any(higher & overlap, axis=2)       # [B, C, M]
    kept = jnp.where(~suppressed & (s > score_threshold), s, 0.0)

    # 4. merge classes
    flat = kept.reshape(B, C * M)
    n_out = min(max_detections, C * M)
    out_scores, out_idx = jax.lax.top_k(flat, n_out)         # [B, n_out]
    box_idx = out_idx % M
    out_classes = (out_idx // M + 1).astype(jnp.int32)
    out_boxes = jnp.take_along_axis(union_boxes, box_idx[..., None], axis=1)

    valid_mask = out_scores > 0.0
    out_classes = jnp.where(valid_mask, out_classes, 0)
    out_boxes = jnp.where(valid_mask[..., None], out_boxes, 0.0)
    valid = jnp.sum(valid_mask.astype(jnp.int32), axis=-1)
    if n_out < max_detections:
        pad = max_detections - n_out
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
    return out_boxes, out_scores, out_classes, valid


@partial(jax.jit, static_argnames=('max_detections', 'per_class_k', 'mode'))
def batched_class_aware_nms(boxes, scores,
                            iou_threshold=0.6,
                            score_threshold=0.005,
                            max_detections=100,
                            per_class_k=100,
                            mode='exact'):
    """Batched multi-class NMS with SSD semantics.

    Args:
      boxes:  [B, A, 4] decoded boxes shared across classes.
      scores: [B, A, C] per-class scores (background already removed).
    Returns:
      nms_boxes  [B, max_detections, 4]
      nms_scores [B, max_detections]      (0.0 for padding)
      nms_classes[B, max_detections]      int32, 1-based labels — class c of
                                          the scores tensor reports as c + 1,
                                          matching the reference's label
                                          offset (edge_tpu.py:49).
      valid      [B]                      int32 count of real detections.
    """
    if mode in ('fused', 'fused_exact', 'fused_exact_pallas'):
        suppression = {'fused': 'fast', 'fused_exact': 'greedy',
                       'fused_exact_pallas': 'greedy_pallas'}[mode]
        return batched_class_aware_nms_fused(
            boxes, scores, iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            max_detections=max_detections,
            suppression=suppression)

    B, A, C = scores.shape
    k = min(per_class_k, A)

    top_scores, top_idx = _per_class_topk(scores, k)     # [B, C, k]
    top_boxes = jnp.take_along_axis(
        boxes[:, None, :, :],                            # [B, 1, A, 4]
        top_idx[..., None], axis=2)                      # -> [B, C, k, 4]

    if mode == 'pallas':
        # VMEM-resident IoU + per-(batch,class) grid programs
        from watsor_tpu.ops.nms_pallas import pallas_suppress
        surviving = pallas_suppress(top_boxes, top_scores, iou_threshold)
        kept_scores = jnp.where(surviving > score_threshold, surviving, 0.0)
    else:
        iou = iou_matrix(top_boxes, top_boxes)           # [B, C, k, k]
        if mode == 'fast':
            keep = _fast_keep(iou, iou_threshold)
        else:
            keep = _greedy_keep(iou, iou_threshold, k)
        kept_scores = jnp.where(keep & (top_scores > score_threshold),
                                top_scores, 0.0)         # [B, C, k]

    # merge classes: global top max_detections over C*k survivors
    flat_scores = kept_scores.reshape(B, C * k)
    flat_boxes = top_boxes.reshape(B, C * k, 4)
    flat_classes = (jnp.arange(C, dtype=jnp.int32)[None, :, None] + 1) \
        .repeat(k, axis=2).reshape(1, C * k).repeat(B, axis=0)

    n_out = min(max_detections, C * k)
    out_scores, out_idx = jax.lax.top_k(flat_scores, n_out)   # [B, n_out]
    out_boxes = jnp.take_along_axis(flat_boxes, out_idx[..., None], axis=1)
    out_classes = jnp.take_along_axis(flat_classes, out_idx, axis=1)

    valid_mask = out_scores > 0.0
    out_classes = jnp.where(valid_mask, out_classes, 0)
    out_boxes = jnp.where(valid_mask[..., None], out_boxes, 0.0)
    valid = jnp.sum(valid_mask.astype(jnp.int32), axis=-1)

    if n_out < max_detections:
        pad = max_detections - n_out
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
    return out_boxes, out_scores, out_classes, valid
