"""End-to-end ML integration: train the tiny shape SSD on the synthetic
dataset, persist it through the zoo, and detect a shape with the REAL JAX
detector (no analytic fixture). The reference gates its analog on a
pre-trained model existing (/root/reference test strategy, SURVEY.md §4);
here it runs on the slow tier (training takes ~5 min on this host's single
CPU core)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_train_save_load_detect(tmp_path):
    import jax.numpy as jnp

    from watsor_tpu.models.ssd import build_detector
    from watsor_tpu.models.zoo import load_weights
    from watsor_tpu.ops.boxes import iou_matrix
    from watsor_tpu.testing.prepare import (SHAPE_MODEL, make_shape_config,
                                            prepare_shape_model)
    from watsor_tpu.testing.shapes import SHAPE_LABELS

    model_dir = str(tmp_path)
    path, loss = prepare_shape_model(model_dir, steps=150, batch=16)
    assert os.path.exists(path)
    assert np.isfinite(loss)

    params = load_weights(model_dir, SHAPE_MODEL)
    assert params is not None
    det = build_detector(make_shape_config(), params=params)

    img = np.full((1, 96, 96, 3), 255, np.uint8)
    img[0, 20:70, 25:75] = 0           # a big rectangle
    out = det.detect_batch(det.params, jnp.asarray(img))
    assert int(out.valid[0]) >= 1, 'nothing detected after training'
    # after a short training run top-1 class is noisy; require a
    # rectangle-labeled detection overlapping the ground truth among the
    # strongest few
    gt = jnp.asarray([[20 / 96, 25 / 96, 70 / 96, 75 / 96]])
    classes = np.asarray(out.classes[0][:10])
    ious = np.asarray(iou_matrix(out.boxes[0][:10], gt))[:, 0]
    hits = (classes == SHAPE_LABELS['rectangle']) & (ious > 0.25)
    assert hits.any(), \
        'no rectangle hit in top-10: classes={} ious={}'.format(
            classes.tolist(), np.round(ious, 2).tolist())
