"""The generic training step drives the EfficientDet family too (anchors +
box-coder scales swapped in)."""

import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from watsor_tpu.models.efficientdet import (EfficientDet,
                                            EfficientDetConfig,
                                            effdet_anchors)
from watsor_tpu.models.train import (init_train_state, make_optimizer,
                                     make_train_step)

TINY = EfficientDetConfig(num_classes=3, variant='lite0', input_size=128,
                          fpn_channels=16, fpn_repeats=1, head_repeats=1,
                          dtype=jnp.float32)


def test_family_aware_trainer_defaults():
    """An EfficientDet config (marked by mean_rgb) must default to the
    EfficientDet model and ITS serving normalization (x-127)/128 — the
    trainer used to hardcode the SSD (2/255)x-1 formula, a small but
    systematic train/serve skew."""
    from watsor_tpu.models.ssd import SSD, SSDConfig
    from watsor_tpu.models.train import _model_for, _normalize_for

    assert isinstance(_model_for(TINY), EfficientDet)
    ssd_cfg = SSDConfig(num_classes=3, dtype=jnp.float32)
    assert isinstance(_model_for(ssd_cfg), SSD)

    x = jnp.asarray([[0.0, 127.0, 255.0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(_normalize_for(TINY)(x)),
                               (np.asarray(x) - 127.0) / 128.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(_normalize_for(ssd_cfg)(x)),
                               np.asarray(x) * (2.0 / 255.0) - 1.0,
                               rtol=1e-6)


def test_effdet_train_step_decreases_loss():
    model = EfficientDet(TINY)
    tx = make_optimizer(learning_rate=5e-3)
    state = init_train_state(TINY, jax.random.PRNGKey(0), tx, model=model)
    step = jax.jit(make_train_step(
        TINY, tx, model=model, anchors=effdet_anchors(TINY),
        box_coder_scales=TINY.box_coder_scales))

    rng = np.random.RandomState(0)
    images = np.full((2, 128, 128, 3), 255, np.uint8)
    images[:, 30:90, 30:90] = 0
    batch = {
        'images': jnp.asarray(images),
        'gt_boxes': jnp.asarray(np.tile(
            np.array([[30 / 128, 30 / 128, 90 / 128, 90 / 128]],
                     np.float32), (2, 1, 1))),
        'gt_labels': jnp.asarray(np.full((2, 1), 3, np.int32)),
        'gt_valid': jnp.asarray(np.ones((2, 1), bool)),
    }
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert float(metrics['num_positive']) >= 1.0


def test_effdet_train_step_bf16_model_losses_in_f32():
    """Training a serving-dtype (bf16) model must still reduce losses in
    f32 — focal/huber sums over ~A anchors collapse in an 8-bit mantissa.
    Regression for the round-3 review finding."""
    cfg = TINY._replace(dtype=jnp.bfloat16)
    model = EfficientDet(cfg)
    tx = make_optimizer(learning_rate=5e-3)
    state = init_train_state(cfg, jax.random.PRNGKey(0), tx, model=model)
    step = jax.jit(make_train_step(
        cfg, tx, model=model, anchors=effdet_anchors(cfg),
        box_coder_scales=cfg.box_coder_scales))
    rng = np.random.RandomState(0)
    batch = {
        'images': jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3),
                                          np.uint8)),
        'gt_boxes': jnp.asarray(np.tile(
            np.array([[0.2, 0.2, 0.7, 0.7]], np.float32), (2, 1, 1))),
        'gt_labels': jnp.asarray(np.full((2, 1), 2, np.int32)),
        'gt_valid': jnp.asarray(np.ones((2, 1), bool)),
    }
    state, metrics = step(state, batch)
    assert metrics['loss'].dtype == jnp.float32
    assert np.isfinite(float(metrics['loss']))
