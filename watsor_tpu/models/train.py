"""SSD training step (anchor matching + focal/huber losses, optax).

The reference's only training path is its test tooling: it generates a
synthetic shape dataset and fine-tunes SSD-MobileNet through the TF OD API
(/root/reference/watsor/test/model/prepare.py:201-357). Here training is a
first-class jittable step so (a) the shape model used by the integration
tests can be produced in-framework, and (b) the step shards over a device
mesh: batch over the ``data`` axis, prediction-head channels over the
``model`` axis (see watsor_tpu/parallel).

Everything is static-shape: ground truth arrives padded to ``max_boxes``
with a validity mask, anchor matching is a dense [A, G] IoU argmax, and the
losses are masked reductions — one XLA program, no host sync.
"""

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from watsor_tpu.models.ssd import SSD, SSDConfig, anchors_for
from watsor_tpu.ops.boxes import encode_boxes, iou_matrix
from watsor_tpu.ops.preprocess import resize_bilinear_mxu

MATCH_IOU = 0.5


def _normalize_for(config):
    """The SAME input normalization the family's serving path applies —
    a config with ``mean_rgb``/``stddev_rgb`` (EfficientDet-Lite:
    (x-127)/128, models/efficientdet.py:507) normalizes with those;
    otherwise the SSD (2/255)x-1 (models/ssd.py build_detector). Training
    or calibrating with a different formula than serving is a small but
    systematic skew."""
    mean = getattr(config, 'mean_rgb', None)
    std = getattr(config, 'stddev_rgb', None)
    if mean is not None and std is not None:
        return lambda x: ((x - mean) / std).astype(config.dtype)
    return lambda x: (x * (2.0 / 255.0) - 1.0).astype(config.dtype)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(learning_rate=1e-3, weight_decay=1e-5):
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def _model_for(config):
    """Default model for a config: an EfficientDet config (marked by its
    Lite ``mean_rgb`` normalization field) builds EfficientDet, anything
    else the SSD — so trainer entry points never silently wrap an
    EfficientDet config in an SSD."""
    if getattr(config, 'mean_rgb', None) is not None:
        from watsor_tpu.models.efficientdet import EfficientDet
        return EfficientDet(config)
    return SSD(config)


def init_train_state(config, rng, tx, model=None) -> TrainState:
    if model is None:
        model = _model_for(config)
    dummy = jnp.zeros((1, config.input_size, config.input_size, 3),
                      config.dtype)
    variables = model.init(rng, dummy, train=True)
    return TrainState(variables, tx.init(variables['params']),
                      jnp.zeros((), jnp.int32))


def _match_anchors(anchors, coder_scales, gt_boxes, gt_labels, gt_valid):
    """Per-image anchor matching. gt_boxes [G, 4] normalized, gt_labels [G]
    (1-based), gt_valid [G] bool -> (cls_targets [A], box_targets [A, 4],
    positive [A])."""
    iou = iou_matrix(anchors, gt_boxes)                 # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)                   # [A]
    best_iou = jnp.max(iou, axis=1)
    positive = best_iou >= MATCH_IOU
    # force_match_for_each_row (TF-OD ArgMaxMatcher): every ground-truth
    # box claims its single best anchor even below the IoU threshold —
    # otherwise a small/odd-shaped object whose best anchor IoU is 0.45
    # has zero positives and is systematically unlearnable
    A = anchors.shape[0]
    best_anchor = jnp.argmax(iou, axis=0)               # [G]
    # invalid gts scatter to a shed row A so they can't clobber a valid
    # gt's claim at a duplicated anchor index
    target_anchor = jnp.where(gt_valid, best_anchor, A)
    forced = jnp.zeros((A + 1,), bool).at[target_anchor].set(True)[:A]
    forced_gt = jnp.zeros((A + 1,), best_gt.dtype) \
        .at[target_anchor].set(jnp.arange(gt_boxes.shape[0]))[:A]
    best_gt = jnp.where(forced, forced_gt, best_gt)
    positive = positive | forced
    cls_targets = jnp.where(positive, gt_labels[best_gt], 0)
    box_targets = encode_boxes(gt_boxes[best_gt], anchors,
                               scales=coder_scales)
    return cls_targets, box_targets, positive


def _focal_loss(logits, targets_onehot, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets_onehot)
    p_t = p * targets_onehot + (1.0 - p) * (1.0 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1.0 - alpha) * (1.0 - targets_onehot)
    return alpha_t * ((1.0 - p_t) ** gamma) * ce


def make_train_step(config, tx, model=None, anchors=None,
                    box_coder_scales=None):
    """Returns a jittable ``step(state, batch) -> (state, metrics)``.

    Works for every detector family sharing the (box_encodings, logits)
    head contract. Defaults are family-aware: an EfficientDet config
    (marked by ``mean_rgb``) builds EfficientDet with ``effdet_anchors``
    and its serving normalization; anything else builds the SSD. Pass
    ``model``/``anchors``/``box_coder_scales`` to override.

    batch: dict with
      images    [B, H, W, 3] uint8 (resized on device to the model input)
      gt_boxes  [B, G, 4] normalized ymin/xmin/ymax/xmax
      gt_labels [B, G] int32 1-based
      gt_valid  [B, G] bool
    """
    if model is None:
        model = _model_for(config)
    if anchors is None:
        if getattr(config, 'mean_rgb', None) is not None:
            from watsor_tpu.models.efficientdet import effdet_anchors
            anchors = effdet_anchors(config)
        else:
            anchors = anchors_for(config)
    anchors = jnp.asarray(anchors)
    if box_coder_scales is None:
        box_coder_scales = getattr(config, 'box_coder_scales', None) or \
            (10.0, 10.0, 5.0, 5.0)
    # SSD heads carry an explicit background column (one-hot index 0);
    # EfficientDet follows the automl sigmoid convention: no background
    # column, negatives train toward the all-zero target
    explicit_bg = getattr(config, 'explicit_background', True)
    num_cls = config.num_classes + (1 if explicit_bg else 0)

    normalize = _normalize_for(config)

    def loss_fn(params, batch_stats, batch):
        x = resize_bilinear_mxu(batch['images'], config.input_size,
                                config.input_size, dtype=jnp.float32)
        x = normalize(x)
        (box_enc, logits), mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats}, x, train=True,
            mutable=['batch_stats'])
        # the model may emit its serving dtype (bf16): losses reduce over
        # ~A anchors per image, and large sums in an 8-bit mantissa
        # collapse — compute the loss in f32 regardless of serving dtype
        box_enc = box_enc.astype(jnp.float32)
        logits = logits.astype(jnp.float32)

        cls_t, box_t, positive = jax.vmap(
            partial(_match_anchors, anchors, box_coder_scales))(
                batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'])

        # without a background column, label 0 maps to -1 -> all-zero row
        onehot = jax.nn.one_hot(cls_t if explicit_bg else cls_t - 1, num_cls)
        cls_loss = _focal_loss(logits, onehot).sum(-1)          # [B, A]
        box_loss = optax.huber_loss(box_enc, box_t).sum(-1)     # [B, A]
        num_pos = jnp.maximum(positive.sum(), 1.0)
        total = (cls_loss.sum() +
                 jnp.where(positive, box_loss, 0.0).sum()) / num_pos
        return total, ({'cls_loss': cls_loss.sum() / num_pos,
                        'box_loss': jnp.where(positive, box_loss, 0.0).sum()
                        / num_pos,
                        'num_positive': num_pos},
                       mutated['batch_stats'])

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, batch_stats)), grads = grad_fn(
            state.params['params'], state.params.get('batch_stats', {}),
            batch)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params['params'])
        params = {
            'params': optax.apply_updates(state.params['params'], updates),
            'batch_stats': batch_stats,   # BN running stats track training
        }
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def calibrate_batch_stats(config, variables, image_batches, model=None):
    """Precise-BN recalibration: replace the lagging EMA running stats with
    the arithmetic mean of exact per-batch moments over ``image_batches``.

    BatchNorm running averages converge as momentum**steps — MobileNetV2
    uses momentum 0.997, so after the shape trainer's ~300 steps the stats
    are barely half converged, and ~50 stacked BN layers compound the
    normalization error until ReLU6 saturates and eval-mode detections
    collapse to an image-independent constant (measured: cross-image logit
    spread 0.018 eval vs 10.6 train after an overfit run). One
    forward-only averaging pass after training fixes serving without
    touching the model.

    The per-batch moment is recovered exactly without knowing each layer's
    momentum: flax mutates ``new = m*old + (1-m)*moment``, so applying once
    with old=0 and once with old=1 yields ``m = new1 - new0`` leafwise and
    ``moment = new0 / (1-m)``.

    ``image_batches``: iterable of [B, H, W, 3] uint8 arrays (same ingest
    contract as the train step: device resize + the family's serving
    normalization, see _normalize_for).
    Returns a new variables dict; a stats-free model passes through.
    """
    if model is None:
        model = _model_for(config)
    stats = variables.get('batch_stats', {})
    if not jax.tree_util.tree_leaves(stats):
        return variables

    normalize = _normalize_for(config)

    @jax.jit
    def mutated_stats(params, old_stats, images):
        x = resize_bilinear_mxu(images, config.input_size, config.input_size,
                                dtype=jnp.float32)
        x = normalize(x)
        _, mutated = model.apply({'params': params, 'batch_stats': old_stats},
                                 x, train=True, mutable=['batch_stats'])
        return mutated['batch_stats']

    tree_map = jax.tree_util.tree_map
    zeros = tree_map(jnp.zeros_like, stats)
    ones = tree_map(jnp.ones_like, stats)
    params = variables['params']
    momentum = None
    total, count = None, 0
    for images in image_batches:
        images = jnp.asarray(images)
        new0 = mutated_stats(params, zeros, images)
        if momentum is None:
            new1 = mutated_stats(params, ones, images)
            momentum = tree_map(lambda a, b: b - a, new0, new1)
        moment = tree_map(lambda n0, m: n0 / jnp.maximum(1.0 - m, 1e-6),
                          new0, momentum)
        total = moment if total is None else tree_map(jnp.add, total, moment)
        count += 1
    if count == 0:
        return variables
    return dict(variables,
                batch_stats=tree_map(lambda t: t / count, total))
