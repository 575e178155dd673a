"""Fused (gather-free) NMS: agreement with the exact formulation on
well-separated cases, Fast-NMS suppression semantics, contract shape."""

import numpy as np

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
