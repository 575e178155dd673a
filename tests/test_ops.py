"""Unit tests for the device-side ops: anchors, box coding, NMS, resize.

These mirror the correctness the reference gets implicitly from its frozen
graphs (anchor layout, box-coder scale factors, NMS semantics, label+1
offset) — here they are first-class code, so they get first-class tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from watsor_tpu.ops.anchors import AnchorSpec, anchors_per_location, \
    ssd300_feature_shapes, ssd_anchors
from watsor_tpu.ops.boxes import decode_boxes, encode_boxes, iou_matrix
from watsor_tpu.ops.nms import batched_class_aware_nms
from watsor_tpu.ops.preprocess import preprocess_batch, resize_bilinear_mxu


class TestAnchors:

    def test_ssd300_ladder(self):
        assert ssd300_feature_shapes(300) == \
            ((19, 19), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1))

    def test_anchor_count_matches_ssd300(self):
        # classic SSD-MobileNet: 19²·3 + (10²+5²+3²+2²+1)·6 = 1917
        anchors = ssd_anchors(ssd300_feature_shapes(300))
        assert anchors.shape == (1917, 4)

    def test_anchors_per_location(self):
        assert anchors_per_location(AnchorSpec()) == (3, 6, 6, 6, 6, 6)

    def test_aspect_one_anchor_is_square_and_centered(self):
        anchors = ssd_anchors(((1, 1),) * 6, AnchorSpec(num_layers=6))
        # last layer has a single cell centered at (0.5, 0.5)
        last = anchors[-6:]
        h = last[:, 2] - last[:, 0]
        w = last[:, 3] - last[:, 1]
        centers_y = (last[:, 0] + last[:, 2]) / 2
        np.testing.assert_allclose(centers_y, 0.5, atol=1e-6)
        # aspect-1 anchors are square
        np.testing.assert_allclose(h[0], w[0], rtol=1e-5)


class TestBoxCoder:

    def test_decode_zero_codes_recovers_anchors(self):
        anchors = ssd_anchors(ssd300_feature_shapes(300)).astype(np.float32)
        inner = np.clip(anchors, 0.0, 1.0)
        decoded = decode_boxes(jnp.zeros((1917, 4)), anchors)
        np.testing.assert_allclose(np.asarray(decoded), inner, atol=1e-5)

    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(0)
        anchors = ssd_anchors(ssd300_feature_shapes(300)).astype(np.float32)
        n = 64
        centers = rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32)
        sizes = rng.uniform(0.05, 0.2, (n, 2)).astype(np.float32)
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1)[:, [0, 1, 2, 3]].astype(np.float32)
        codes = encode_boxes(boxes, anchors[:n])
        decoded = decode_boxes(codes, anchors[:n])
        np.testing.assert_allclose(np.asarray(decoded), boxes, atol=1e-4)

    def test_iou_identity_and_disjoint(self):
        boxes = jnp.array([[0.0, 0.0, 0.5, 0.5],
                           [0.5, 0.5, 1.0, 1.0],
                           [0.0, 0.0, 1.0, 1.0]])
        iou = np.asarray(iou_matrix(boxes, boxes))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
        assert iou[0, 1] == pytest.approx(0.0, abs=1e-6)
        assert iou[0, 2] == pytest.approx(0.25, abs=1e-5)


class TestNMS:

    def _run(self, boxes, scores, **kw):
        return batched_class_aware_nms(jnp.asarray(boxes, jnp.float32),
                                       jnp.asarray(scores, jnp.float32), **kw)

    def test_suppresses_overlaps_keeps_best(self):
        boxes = np.zeros((1, 3, 4), np.float32)
        boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
        boxes[0, 1] = [0.12, 0.12, 0.52, 0.52]   # heavy overlap with 0
        boxes[0, 2] = [0.6, 0.6, 0.9, 0.9]       # disjoint
        scores = np.zeros((1, 3, 2), np.float32)
        scores[0, 0, 0] = 0.9
        scores[0, 1, 0] = 0.8
        scores[0, 2, 0] = 0.7
        b, s, c, v = self._run(boxes, scores, max_detections=10, per_class_k=3)
        assert int(v[0]) == 2
        assert float(s[0, 0]) == pytest.approx(0.9)
        assert float(s[0, 1]) == pytest.approx(0.7)
        # labels are 1-based (reference's class+1 offset)
        assert int(c[0, 0]) == 1

    def test_class_aware_no_cross_class_suppression(self):
        boxes = np.zeros((1, 2, 4), np.float32)
        boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
        boxes[0, 1] = [0.1, 0.1, 0.5, 0.5]       # same box
        scores = np.zeros((1, 2, 3), np.float32)
        scores[0, 0, 0] = 0.9                     # class 1
        scores[0, 1, 2] = 0.8                     # class 3
        b, s, c, v = self._run(boxes, scores, max_detections=10, per_class_k=2)
        assert int(v[0]) == 2
        assert sorted([int(c[0, 0]), int(c[0, 1])]) == [1, 3]

    def test_score_threshold_and_padding(self):
        boxes = np.random.RandomState(0).uniform(0, 1, (2, 8, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + 0.1
        scores = np.full((2, 8, 4), 0.001, np.float32)   # all below threshold
        b, s, c, v = self._run(boxes, scores, score_threshold=0.01,
                               max_detections=5, per_class_k=4)
        assert int(v.sum()) == 0
        assert np.all(np.asarray(c) == 0)
        assert np.all(np.asarray(b) == 0.0)
        assert s.shape == (2, 5)

    def test_fast_mode_agrees_on_disjoint_boxes(self):
        rng = np.random.RandomState(1)
        # a grid of disjoint boxes: fast and exact must agree exactly
        boxes = np.zeros((1, 16, 4), np.float32)
        for i in range(16):
            r, cc = divmod(i, 4)
            boxes[0, i] = [r * 0.25, cc * 0.25, r * 0.25 + 0.2, cc * 0.25 + 0.2]
        scores = rng.uniform(0.3, 0.9, (1, 16, 1)).astype(np.float32)
        out_e = self._run(boxes, scores, mode='exact', per_class_k=16)
        out_f = self._run(boxes, scores, mode='fast', per_class_k=16)
        assert int(out_e[3][0]) == int(out_f[3][0]) == 16


class TestPreprocess:

    def test_resize_identity(self):
        x = np.random.RandomState(0).randint(0, 255, (2, 8, 8, 3), np.uint8)
        y = resize_bilinear_mxu(jnp.asarray(x), 8, 8)
        np.testing.assert_allclose(np.asarray(y), x.astype(np.float32))

    def test_resize_matches_cv2_bilinear(self):
        cv2 = pytest.importorskip('cv2')
        x = np.random.RandomState(0).randint(0, 255, (1, 48, 64, 3), np.uint8)
        y = np.asarray(resize_bilinear_mxu(jnp.asarray(x), 30, 30,
                                           dtype=jnp.float32))[0]
        ref = cv2.resize(x[0], (30, 30), interpolation=cv2.INTER_LINEAR)
        # cv2 INTER_LINEAR uses fixed-point weights; allow ~2 LSB rounding
        diff = np.abs(y - ref.astype(np.float32))
        assert diff.max() < 2.0 and diff.mean() < 0.5

    def test_preprocess_range(self):
        x = np.zeros((1, 16, 16, 3), np.uint8)
        x[..., 0] = 255
        y = np.asarray(preprocess_batch(jnp.asarray(x), 16, 16,
                                        dtype=jnp.float32))
        assert y[..., 0].max() == pytest.approx(1.0, abs=1e-2)
        assert y[..., 1].min() == pytest.approx(-1.0, abs=1e-2)
