"""EfficientDet-Lite: anchors vs head shapes, fused detection contract."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.models.efficientdet import (EfficientDetConfig,
                                            build_effdet, effdet_anchors,
                                            effdet_feature_shapes)

TINY = EfficientDetConfig(num_classes=3, variant='lite0', input_size=128,
                          fpn_channels=16, fpn_repeats=1, head_repeats=1,
                          dtype=jnp.float32)


def test_feature_shapes_ladder():
    shapes = effdet_feature_shapes(TINY)
    assert shapes == [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]


def test_anchor_count():
    anchors = effdet_anchors(TINY)
    cells = sum(h * w for h, w in effdet_feature_shapes(TINY))
    assert anchors.shape == (cells * TINY.anchors_per_cell, 4)


@pytest.fixture(scope='module')
def tiny_effdet():
    return build_effdet(TINY, rng=jax.random.PRNGKey(0))


def test_heads_match_anchors(tiny_effdet):
    det = tiny_effdet
    x = jnp.zeros((1, TINY.input_size, TINY.input_size, 3), TINY.dtype)
    boxes, logits = det.raw_apply(det.params, x)
    assert boxes.shape == (1, det.anchors.shape[0], 4)
    # automl convention: no background column, sigmoid heads
    assert logits.shape == (1, det.anchors.shape[0], TINY.num_classes)


def test_detect_batch_contract(tiny_effdet):
    det = tiny_effdet
    frames = np.random.RandomState(0).randint(0, 255, (2, 100, 160, 3),
                                              np.uint8)
    out = det.detect_batch(det.params, jnp.asarray(frames))
    assert out.boxes.shape == (2, TINY.max_detections, 4)
    assert out.classes.shape == (2, TINY.max_detections)
    assert np.asarray(out.boxes).min() >= 0.0
    assert np.asarray(out.boxes).max() <= 1.0


def test_fastattn_fusion_builds():
    """The non-Lite fusion (fast attention, per-node WSM weights) compiles
    and differs from plain-sum fusion."""
    import jax
    cfg = TINY._replace(fpn_weight_method='fastattn')
    det = build_effdet(cfg, rng=jax.random.PRNGKey(0))
    assert 'WSM' in det.params['params']['bifpn0']['fnode0']
    x = jnp.zeros((1, TINY.input_size, TINY.input_size, 3), TINY.dtype)
    boxes, logits = det.raw_apply(det.params, x)
    assert logits.shape[-1] == TINY.num_classes


def test_lite_variant_scaling():
    """lite1/lite2 apply the published compound scaling and build from the
    zoo without an explicit registry entry."""
    from watsor_tpu.models.efficientdet import lite_config
    import jax.numpy as jnp
    for variant, (size, ch, fpn_r, _) in (
            ('lite0', (320, 64, 3, 3)),
            ('lite1', (384, 88, 4, 3)),
            ('lite2', (448, 112, 5, 3))):
        cfg = lite_config(variant)
        assert (cfg.input_size, cfg.fpn_channels, cfg.fpn_repeats) == \
            (size, ch, fpn_r)
    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('efficientdet_lite1', dtype=jnp.float32)
    assert det.config.input_size == 384


def test_bf16_model_classic_nms_scores_are_f32():
    """A bf16 model routed through a CLASSIC (non-fused) NMS mode must not
    leak bf16 into the suppression: the pallas kernel swaps into f32 refs
    (bf16 crashed it at trace time) and exact/fast would quantize the
    reported scores. Regression for the round-3 review finding."""
    cfg = TINY._replace(dtype=jnp.bfloat16, nms_mode='exact')
    det = build_effdet(cfg, rng=jax.random.PRNGKey(0))
    frames = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3),
                                              np.uint8)
    out = det.detect_batch(det.params, jnp.asarray(frames))
    assert out.scores.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.scores)).all()
