"""Pallas TPU kernel for the per-class NMS suppression stage.

The XLA formulation (ops/nms.py) materializes the [B, C, K, K] IoU tensor
in HBM and serializes the whole batch on each of the K suppression steps.
This kernel gives each (batch, class) pair its own grid program: the K×K
IoU matrix lives entirely in a VMEM scratch buffer, the greedy loop runs
locally with dynamic row reads on the *ref* (dynamic slicing of values is
not lowerable on TPU — refs are, pallas_guide.md §Memory Access), and
programs parallelize across the grid.

Note: the production post stage uses the gather-free 'fused' formulation
(ops/nms.py batched_class_aware_nms_fused) — this kernel accelerates the
EXACT greedy semantics for parity-critical uses.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _suppress_kernel(boxes_ref, scores_ref, out_ref, iou_ref, keep_ref, *,
                     k, iou_threshold):
    """One (batch, class) candidate set: boxes [1, 4, K], scores [1, 1, K]
    sorted descending -> surviving scores [1, 1, K] (suppressed = 0)."""
    ymin = boxes_ref[0, 0:1, :]                   # [1, K]
    xmin = boxes_ref[0, 1:2, :]
    ymax = boxes_ref[0, 2:3, :]
    xmax = boxes_ref[0, 3:4, :]

    # pairwise IoU into VMEM scratch: rows i (higher-scored), cols j
    inter_ymin = jnp.maximum(ymin.T, ymin)        # [K, K]
    inter_xmin = jnp.maximum(xmin.T, xmin)
    inter_ymax = jnp.minimum(ymax.T, ymax)
    inter_xmax = jnp.minimum(xmax.T, xmax)
    inter = jnp.maximum(inter_ymax - inter_ymin, 0.0) * \
        jnp.maximum(inter_xmax - inter_xmin, 0.0)
    area = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)
    union = area.T + area - inter
    iou_ref[:, :] = inter / jnp.maximum(union, 1e-8)
    keep_ref[:, :] = jnp.ones_like(keep_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, iou_ref.shape[1]), 1)

    def body(i, carry):
        iou_i = iou_ref[pl.ds(i, 1), :]           # [1, K] ref row read
        keep_row = keep_ref[0:1, :]
        # lane dimension can't be dynamically indexed on TPU; extract
        # keep[i] with a masked reduction instead
        keep_i = jnp.max(jnp.where(col == i, keep_row, 0.0))
        suppress = (iou_i > iou_threshold) & (col > i) & (keep_i > 0.5)
        keep_ref[0:1, :] = jnp.where(suppress, 0.0, keep_row)
        return carry

    jax.lax.fori_loop(0, k, body, 0)
    out_ref[0, :, :] = jnp.where(keep_ref[0:1, :] > 0.5,
                                 scores_ref[0, :, :], 0.0)


@partial(jax.jit, static_argnames=('iou_threshold', 'interpret'))
def _pallas_suppress_impl(top_boxes, top_scores, iou_threshold, interpret):
    B, C, K, _ = top_boxes.shape
    k_pad = ((K + LANE - 1) // LANE) * LANE
    boxes_t = jnp.moveaxis(top_boxes, -1, -2)     # [B, C, 4, K]
    if k_pad != K:
        boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 0), (0, 0), (0, k_pad - K)))
        scores = jnp.pad(top_scores, ((0, 0), (0, 0), (0, k_pad - K)))
    else:
        scores = top_scores
    boxes_t = boxes_t.reshape(B * C, 4, k_pad)
    scores = scores.reshape(B * C, 1, k_pad)

    out = pl.pallas_call(
        partial(_suppress_kernel, k=K, iou_threshold=iou_threshold),
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec((1, 4, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * C, 1, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k_pad, k_pad), jnp.float32),   # IoU matrix
            pltpu.VMEM((1, k_pad), jnp.float32),       # keep mask
        ],
        interpret=interpret,
    )(boxes_t, scores)
    return out.reshape(B, C, k_pad)[:, :, :K]


def pallas_suppress(top_boxes, top_scores, iou_threshold=0.6,
                    interpret=None):
    """top_boxes [B, C, K, 4], top_scores [B, C, K] (score-sorted) ->
    surviving scores [B, C, K]. Drop-in for the suppression stage of
    ops/nms.batched_class_aware_nms. Falls back to the Pallas interpreter
    off-TPU (CI runs on the CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _pallas_suppress_impl(top_boxes, top_scores, iou_threshold,
                                 interpret)


# ---------------------------------------------------------------------------
# Exact greedy suppression for the FUSED formulation (nms.py fused_exact):
# the XLA while_loop pays a kernel relaunch + HBM round trip of the keep
# tensor per Jacobi iteration; here the whole suppression runs VMEM-resident
# per image — scores [C, M], one shared overlap matrix [M, M], keep [C, M].
# Formulated as a SELECTION-greedy fori_loop (this rig's Mosaic compile
# helper rejects in-kernel while_loops — BENCHMARKS.md): iteration t picks,
# per class, the highest-scored still-available candidate (lowest index on
# ties — the Jacobi relation's tie-break), keeps it, and retires its
# overlap row, extracted without dynamic lane indexing by a one-hot matmul
# against the shared [M, M] overlap matrix. Classic greedy processes
# candidates in exactly this order, so M bounded iterations produce the
# greedy solution — bit-identical to the XLA Jacobi fixed point
# (tests/test_nms_fixed_point_kernel.py).
# ---------------------------------------------------------------------------

_NEG = -3.0e38                    # "retired" sentinel, far below any score


def _fixed_point_kernel(thr_ref, s_ref, iou_ref, keep_ref, avail_ref):
    s = s_ref[0]                                    # [cc, M]
    cc, M = s.shape
    overlap = (iou_ref[0] > thr_ref[0]).astype(jnp.float32)   # [M, M]
    avail_ref[:, :] = s
    keep_ref[0] = jnp.zeros_like(s)
    col = jax.lax.broadcasted_iota(jnp.int32, (cc, M), 1)

    def body(t, carry):
        avail = avail_ref[:, :]
        best = jnp.max(avail, axis=-1, keepdims=True)         # [cc, 1]
        # every class still holding a live candidate picks its argmax
        # (first index among equals); exhausted classes pick nothing
        is_best = (avail == best) & (best > _NEG * 0.5)
        pick = jnp.min(jnp.where(is_best, col, M), axis=-1,
                       keepdims=True)                         # [cc, 1]
        onehot = (col == pick).astype(jnp.float32)            # [cc, M]
        keep_ref[0] = keep_ref[0] + onehot
        # the picked candidates' overlap rows, one tiny MXU op
        row = jnp.dot(onehot, overlap,
                      preferred_element_type=jnp.float32)     # [cc, M]
        avail_ref[:, :] = jnp.where((row > 0.5) | (onehot > 0.5),
                                    _NEG, avail)
        return carry

    jax.lax.fori_loop(0, M, body, 0)


@partial(jax.jit, static_argnames=('interpret',))
def fixed_point_suppress(scores_cm, iou, iou_threshold=0.6,
                         interpret=False):
    """Exact greedy keep-mask for the fused-union formulation.

    scores_cm [B, C, M] (class-major union scores), iou [B, M, M] shared
    IoU over the union -> keep [B, C, M] bool, bit-identical to the XLA
    Jacobi fixed point in nms.py (same suppressor relation and
    tie-break). ``iou_threshold`` may be traced (it rides in SMEM)."""
    if not interpret and jax.default_backend() != 'tpu':
        interpret = True      # CPU/GPU backends: interpreter fallback
    B, C, M = scores_cm.shape
    # classes are independent in the fixed point, so the class axis chunks
    # into the grid — bounds the per-block [cc, M, M] suppressor compare
    # (a monolithic C=90 block overwhelms the Mosaic compiler)
    cc = min(8, C)
    pad = (-C) % cc
    if pad:
        scores_cm = jnp.pad(scores_cm, ((0, 0), (0, pad), (0, 0)),
                            constant_values=-1.0)
    Cp = C + pad
    thr = jnp.asarray(iou_threshold, jnp.float32).reshape(1)
    keep = pl.pallas_call(
        _fixed_point_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Cp, M), jnp.float32),
        grid=(B, Cp // cc),
        in_specs=[
            pl.BlockSpec((1,), lambda i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cc, M), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, M), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cc, M), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cc, M), jnp.float32),      # still-available scores
        ],
        interpret=interpret,
    )(thr, scores_cm, iou)
    return keep[:, :C] > 0.5
