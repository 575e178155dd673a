"""Fused (gather-free) NMS: agreement with the exact formulation on
well-separated cases, Fast-NMS suppression semantics, contract shape."""

import numpy as np

import jax
import jax.numpy as jnp

from watsor_tpu.ops.nms import batched_class_aware_nms


def test_disjoint_boxes_match_exact():
    boxes = np.zeros((1, 16, 4), np.float32)
    for i in range(16):
        r, c = divmod(i, 4)
        boxes[0, i] = [r * 0.25, c * 0.25, r * 0.25 + 0.2, c * 0.25 + 0.2]
    scores = np.random.RandomState(0).uniform(
        0.3, 0.9, (1, 16, 2)).astype(np.float32)
    exact = batched_class_aware_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    per_class_k=16, mode='exact')
    fused = batched_class_aware_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    mode='fused')
    assert int(exact[3][0]) == int(fused[3][0])
    np.testing.assert_allclose(np.asarray(exact[1]), np.asarray(fused[1]),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(exact[2]),
                                  np.asarray(fused[2]))


def test_overlap_suppressed_best_kept():
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
    boxes[0, 1] = [0.12, 0.12, 0.52, 0.52]
    boxes[0, 2] = [0.6, 0.6, 0.9, 0.9]
    scores = np.zeros((1, 3, 2), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 0] = 0.8
    scores[0, 2, 0] = 0.7
    b, s, c, v = batched_class_aware_nms(jnp.asarray(boxes),
                                         jnp.asarray(scores), mode='fused')
    assert int(v[0]) == 2
    assert float(s[0, 0]) == np.float32(0.9)
    assert int(c[0, 0]) == 1


def test_cross_class_not_suppressed():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (2, 1))
    boxes = boxes[None]
    scores = np.zeros((1, 2, 3), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 2] = 0.8
    b, s, c, v = batched_class_aware_nms(jnp.asarray(boxes),
                                         jnp.asarray(scores), mode='fused')
    assert int(v[0]) == 2
    assert sorted([int(c[0, 0]), int(c[0, 1])]) == [1, 3]


def test_score_ties_keep_single():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32),
                    (3, 1))[None]
    scores = np.full((1, 3, 1), 0.8, np.float32)   # identical boxes+scores
    b, s, c, v = batched_class_aware_nms(jnp.asarray(boxes),
                                         jnp.asarray(scores), mode='fused')
    assert int(v[0]) == 1, 'tie-break failed: {} kept'.format(int(v[0]))


def test_padding_and_contract_shapes():
    boxes = np.random.RandomState(1).uniform(0, 0.5, (3, 40, 4)) \
        .astype(np.float32)
    boxes[..., 2:] += 0.1
    scores = np.full((3, 40, 5), 0.001, np.float32)
    b, s, c, v = batched_class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), mode='fused',
        score_threshold=0.01, max_detections=50)
    assert b.shape == (3, 50, 4) and s.shape == (3, 50)
    assert int(np.asarray(v).sum()) == 0


def test_late_materialization_bitwise_matches_eager():
    """`batched_class_aware_nms_fused_late` (rank union on raw logits,
    decode/sigmoid only the M survivors) must match the eager formulation
    (decode+sigmoid everything, then select) for both suppression
    semantics — decode and sigmoid are elementwise, so gather-then-op ==
    op-then-gather, and sigmoid's monotonicity keeps the union selection
    and its tie order unchanged. Floats are compared to 1e-6 (the two
    compiled programs may contract multiply-adds into FMAs differently —
    observed ulp-level-only drift); classes/valid must be exact."""
    from watsor_tpu.ops.boxes import decode_boxes, encode_boxes
    from watsor_tpu.ops.nms import (batched_class_aware_nms_fused,
                                    batched_class_aware_nms_fused_late)

    rng = np.random.RandomState(7)
    B, A, C = 3, 400, 5
    scales = (10.0, 10.0, 5.0, 5.0)
    # anchors: a jittered grid; box_enc: encodings of real boxes near them
    centers = rng.uniform(0.1, 0.9, (A, 2)).astype(np.float32)
    sizes = rng.uniform(0.05, 0.3, (A, 2)).astype(np.float32)
    anchors = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                             axis=-1).astype(np.float32)
    target = np.clip(
        anchors[None].repeat(B, 0) +
        rng.uniform(-0.05, 0.05, (B, A, 4)), 0, 1).astype(np.float32)
    box_enc = np.asarray(
        encode_boxes(jnp.asarray(target), jnp.asarray(anchors),
                     scales=scales), np.float32)
    logits = rng.uniform(-6, 3, (B, A, C)).astype(np.float32)
    # duplicated logits rows exercise the tie-break order
    logits[:, 50] = logits[:, 40]

    for dtype in (np.float32, jnp.bfloat16):
        enc_d = jnp.asarray(box_enc).astype(dtype)
        logits_d = jnp.asarray(logits).astype(dtype)
        boxes_full = decode_boxes(enc_d.astype(jnp.float32),
                                  jnp.asarray(anchors), scales=scales)
        # f32 sigmoid reference: injective over this logit range, so the
        # eager union order equals the late path's raw-logit order (bf16
        # sigmoid would collide distinct logits into artificial ties —
        # the late path's ranking is the strictly finer one)
        scores_full = jax.nn.sigmoid(logits_d.astype(jnp.float32))
        for suppression in ('fast', 'greedy'):
            eager = batched_class_aware_nms_fused(
                boxes_full, scores_full, suppression=suppression)
            late = batched_class_aware_nms_fused_late(
                enc_d, logits_d, jnp.asarray(anchors), scales=scales,
                suppression=suppression)
            np.testing.assert_allclose(np.asarray(eager[0], np.float32),
                                       np.asarray(late[0], np.float32),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(eager[1], np.float32),
                                       np.asarray(late[1], np.float32),
                                       atol=1e-6)
            np.testing.assert_array_equal(np.asarray(eager[2]),
                                          np.asarray(late[2]))
            np.testing.assert_array_equal(np.asarray(eager[3]),
                                          np.asarray(late[3]))
