"""SSD training step: loss is finite, decreases on a fixed synthetic
batch, and the optimizer updates parameters (component #40 parity — the
reference trains its shape model through the TF OD API; here the step is
first-class and jittable)."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.models.ssd import SSDConfig
from watsor_tpu.models.train import (init_train_state, make_optimizer,
                                     make_train_step)

TINY = SSDConfig(num_classes=3, input_size=128, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32)


def _shape_batch(batch=4, seed=0):
    rng = np.random.RandomState(seed)
    images = np.full((batch, 128, 128, 3), 255, np.uint8)
    gt_boxes = np.zeros((batch, 2, 4), np.float32)
    gt_labels = np.zeros((batch, 2), np.int32)
    gt_valid = np.zeros((batch, 2), bool)
    for i in range(batch):
        x0, y0 = rng.randint(10, 60, 2)
        size = rng.randint(30, 60)
        images[i, y0:y0 + size, x0:x0 + size] = 0
        gt_boxes[i, 0] = [y0 / 128, x0 / 128, (y0 + size) / 128,
                          (x0 + size) / 128]
        gt_labels[i, 0] = 3           # rectangle
        gt_valid[i, 0] = True
    return {'images': jnp.asarray(images),
            'gt_boxes': jnp.asarray(gt_boxes),
            'gt_labels': jnp.asarray(gt_labels),
            'gt_valid': jnp.asarray(gt_valid)}


def test_train_step_reduces_loss():
    tx = make_optimizer(learning_rate=5e-3)
    state = init_train_state(TINY, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(TINY, tx))
    batch = _shape_batch()

    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.9, \
        'loss did not decrease: {}'.format(losses)
    assert int(state.step) == 6


def test_calibrate_batch_stats_restores_eval_mode():
    """Precise-BN regression: after a short training run the 0.997-momentum
    running averages lag the trained activation statistics so badly that
    eval-mode logits collapse toward an image-independent constant;
    calibrate_batch_stats must bring eval within a whisker of train mode."""
    from watsor_tpu.models.ssd import SSD
    from watsor_tpu.models.train import calibrate_batch_stats

    tx = make_optimizer(learning_rate=5e-3)
    state = init_train_state(TINY, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(TINY, tx))
    batch = _shape_batch()
    for _ in range(30):
        state, _ = step(state, batch)

    model = SSD(TINY)
    from watsor_tpu.ops.preprocess import resize_bilinear_mxu
    x = resize_bilinear_mxu(batch['images'], TINY.input_size,
                            TINY.input_size, dtype=jnp.float32)
    x = x * (2.0 / 255.0) - 1.0
    (_, logits_train), _ = model.apply(state.params, x, train=True,
                                       mutable=['batch_stats'])
    _, logits_stale = model.apply(state.params, x, train=False)

    calibrated = calibrate_batch_stats(TINY, state.params,
                                       [batch['images']] * 2)
    _, logits_calib = model.apply(calibrated, x, train=False)

    err_stale = float(jnp.max(jnp.abs(logits_stale - logits_train)))
    err_calib = float(jnp.max(jnp.abs(logits_calib - logits_train)))
    # calibration must land at least 10x closer to the train-mode output
    # than the stale EMA stats (measured: ~200 stale vs ~0.03 calibrated
    # on the full shape model)
    assert err_calib < err_stale / 10.0, (err_stale, err_calib)
    # and params without batch_stats pass through untouched
    bare = {'params': state.params['params']}
    assert calibrate_batch_stats(TINY, bare, [batch['images']]) is bare


def test_positive_anchors_matched():
    tx = make_optimizer()
    state = init_train_state(TINY, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(TINY, tx))
    state, metrics = step(state, _shape_batch())
    # a 30-60px box on a 128px image overlaps several anchors
    assert float(metrics['num_positive']) >= 1.0


def test_force_match_assigns_low_iou_ground_truth():
    """force_match_for_each_row (TF-OD ArgMaxMatcher): a gt whose best
    anchor IoU is below the threshold still claims that anchor — without
    it, small/odd-shaped objects have zero positives and are
    unlearnable."""
    import jax.numpy as jnp
    import numpy as np
    from watsor_tpu.models.train import _match_anchors

    anchors = jnp.asarray([[0.0, 0.0, 0.4, 0.4],
                           [0.6, 0.6, 1.0, 1.0]], jnp.float32)
    # tiny gt inside anchor 0's cell: IoU ~0.0056 << 0.5
    gt_boxes = jnp.asarray([[0.1, 0.1, 0.13, 0.13]], jnp.float32)
    gt_labels = jnp.asarray([7], jnp.int32)
    gt_valid = jnp.asarray([True])
    cls, box, pos = _match_anchors(anchors, (10.0, 10.0, 5.0, 5.0),
                                   gt_boxes, gt_labels, gt_valid)
    assert bool(pos[0]) and int(cls[0]) == 7     # forced match
    assert not bool(pos[1])

    # an INVALID gt must not claim anything (nor clobber a valid claim)
    gt_boxes2 = jnp.asarray([[0.1, 0.1, 0.13, 0.13],
                             [0.0, 0.0, 0.01, 0.01]], jnp.float32)
    gt_labels2 = jnp.asarray([7, 9], jnp.int32)
    gt_valid2 = jnp.asarray([True, False])
    cls2, _, pos2 = _match_anchors(anchors, (10.0, 10.0, 5.0, 5.0),
                                   gt_boxes2, gt_labels2, gt_valid2)
    assert bool(pos2[0]) and int(cls2[0]) == 7
