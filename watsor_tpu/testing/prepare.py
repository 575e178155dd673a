"""Shape-model preparation: generate a synthetic dataset with the
framework's own fixtures and train the tiny shape SSD on it.

The reference drives the same idea through the TF Object Detection API —
Artist-drawn shapes become TFRecords and an external training job
(/root/reference/watsor/test/model/prepare.py:311-357). Here dataset
generation AND the training loop are in-framework: analytic ground truth
comes from the contour detector, the step is the jittable SSD trainer, and
the result saves into the model zoo for the detection integration test.

    python -m watsor_tpu.testing.prepare --steps 300 --out /tmp/model
"""

import argparse
import logging

import numpy as np

_LOGGER = logging.getLogger(__name__)

SHAPE_MODEL = 'ssd_mobilenet_v2_shapes'


def make_shape_config(input_size=96):
    import jax.numpy as jnp

    from watsor_tpu.models.ssd import SSDConfig
    return SSDConfig(num_classes=3, input_size=input_size,
                     width_multiplier=0.35,
                     extra_features=(32, 32, 32, 32), dtype=jnp.float32)


def generate_batch(batch, hw=(96, 96), max_boxes=4, seed=0):
    """Draw shapes (same painter as the Artist fixture) and label them
    analytically with the contour detector."""
    import cv2

    from watsor_tpu.detection.backend import DetectorBackend
    from watsor_tpu.testing.shapes import SHAPE_LABELS, ShapeDetectorBackend

    h, w = hw
    rng = np.random.RandomState(seed)
    detector = ShapeDetectorBackend((h, w))
    images = np.full((batch, h, w, 3), 255, np.uint8)
    gt_boxes = np.zeros((batch, max_boxes, 4), np.float32)
    gt_labels = np.zeros((batch, max_boxes), np.int32)
    gt_valid = np.zeros((batch, max_boxes), bool)

    for i in range(batch):
        size = rng.randint(min(h, w) // 4, min(h, w) // 2)
        x0 = rng.randint(0, w - size)
        y0 = rng.randint(0, h - size)
        shape = list(SHAPE_LABELS)[rng.randint(3)]
        if shape == 'triangle':
            pts = np.array([[x0 + size // 2, y0], [x0, y0 + size - 1],
                            [x0 + size - 1, y0 + size - 1]], np.int32)
            cv2.fillPoly(images[i], [pts], (0, 0, 0))
        elif shape == 'ellipse':
            cv2.ellipse(images[i], (x0 + size // 2, y0 + size // 2),
                        (size // 2, size // 3), 0, 0, 360, (0, 0, 0), -1)
        else:
            cv2.rectangle(images[i], (x0, y0),
                          (x0 + size - 1, y0 + size - 1), (0, 0, 0), -1)
        found = detector._detect_one(images[i])[:max_boxes]
        for j, (label, _conf, box) in enumerate(found):
            gt_labels[i, j] = label
            gt_boxes[i, j] = box
            gt_valid[i, j] = True
    return {'images': images, 'gt_boxes': gt_boxes,
            'gt_labels': gt_labels, 'gt_valid': gt_valid}


def train_shape_model(steps=300, batch=16, input_size=96, seed=0,
                      learning_rate=3e-3, log_every=50):
    """Returns (params, config, final_loss)."""
    import jax
    import jax.numpy as jnp

    from watsor_tpu.models.train import (calibrate_batch_stats,
                                         init_train_state, make_optimizer,
                                         make_train_step)

    config = make_shape_config(input_size)
    tx = make_optimizer(learning_rate=learning_rate)
    state = init_train_state(config, jax.random.PRNGKey(seed), tx)
    step = jax.jit(make_train_step(config, tx))

    loss = float('nan')
    for i in range(steps):
        batch_np = generate_batch(batch, (input_size, input_size),
                                  seed=seed + i + 1)
        batch_dev = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch_dev)
        if (i + 1) % log_every == 0 or i == 0:
            loss = float(metrics['loss'])
            _LOGGER.info('step %d: loss %.4f (cls %.4f box %.4f)',
                         i + 1, loss, float(metrics['cls_loss']),
                         float(metrics['box_loss']))
    # short runs leave the 0.997-momentum BN running averages far from the
    # trained activation statistics — recalibrate them (precise BN) so the
    # saved model serves in eval mode as well as it trained
    calib = (generate_batch(batch, (input_size, input_size),
                            seed=seed + steps + 1 + i)['images']
             for i in range(8))
    params = calibrate_batch_stats(config, state.params, calib)
    return params, config, float(metrics['loss'])


def prepare_shape_model(out_dir, steps=300, **kw):
    """Train and persist the shape model into the zoo format."""
    from watsor_tpu.models.zoo import save_weights

    params, config, loss = train_shape_model(steps=steps, **kw)
    path = save_weights(params, out_dir, SHAPE_MODEL)
    _LOGGER.info('shape model saved to %s (final loss %.4f)', path, loss)
    return path, loss


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Generate the synthetic shape dataset and train the '
                    'shape detection model')
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--batch', type=int, default=16)
    parser.add_argument('--out', required=True, help='model directory')
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    prepare_shape_model(args.out, steps=args.steps, batch=args.batch)


if __name__ == '__main__':
    main()
