"""SSD model construction + fused detection step smoke tests (CPU backend).

Uses a tiny input size to keep CI fast; shape relationships (anchors vs head
outputs) must hold for any size, which is the real invariant.
"""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.models.ssd import SSD, SSDConfig, anchors_for, build_detector


TINY = SSDConfig(num_classes=3, input_size=128, width_multiplier=0.35,
                 extra_features=(64, 64, 64, 64), dtype=jnp.float32)


@pytest.fixture(scope='module')
def tiny_detector():
    return build_detector(TINY, rng=jax.random.PRNGKey(42))


class TestSSDModel:

    def test_head_outputs_match_anchor_count(self, tiny_detector):
        det = tiny_detector
        anchors = anchors_for(TINY)
        x = jnp.zeros((2, TINY.input_size, TINY.input_size, 3), TINY.dtype)
        box_enc, logits = det.raw_apply(det.params, x)
        assert box_enc.shape == (2, anchors.shape[0], 4)
        assert logits.shape == (2, anchors.shape[0], TINY.num_classes + 1)

    def test_detect_batch_contract(self, tiny_detector):
        det = tiny_detector
        # frames at a non-model resolution: resize happens on device
        frames = np.random.RandomState(0).randint(
            0, 255, (2, 96, 160, 3), np.uint8)
        out = det.detect_batch(det.params, jnp.asarray(frames))
        B, N = 2, TINY.max_detections
        assert out.boxes.shape == (B, N, 4)
        assert out.scores.shape == (B, N)
        assert out.classes.shape == (B, N)
        assert out.valid.shape == (B,)
        boxes = np.asarray(out.boxes)
        assert boxes.min() >= 0.0 and boxes.max() <= 1.0
        classes = np.asarray(out.classes)
        assert classes.min() >= 0 and classes.max() <= TINY.num_classes

    def test_detect_batch_is_deterministic(self, tiny_detector):
        det = tiny_detector
        frames = jnp.asarray(np.random.RandomState(1).randint(
            0, 255, (1, 64, 64, 3), np.uint8))
        a = det.detect_batch(det.params, frames)
        b = det.detect_batch(det.params, frames)
        np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))
