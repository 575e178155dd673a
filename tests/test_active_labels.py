"""Class subsetting: a detector built with active_labels only reports
those labels, and they come back in COCO label space."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.config.coco import coco_label_index
from watsor_tpu.models.ssd import SSDConfig, build_detector

PERSON = coco_label_index('person')
CAR = coco_label_index('car')

TINY = SSDConfig(num_classes=10, input_size=96, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32,
                 score_threshold=0.0)


def test_active_labels_restrict_and_remap():
    det_all = build_detector(TINY, rng=jax.random.PRNGKey(3))
    det_sub = build_detector(
        TINY._replace(active_labels=(PERSON, CAR)),
        rng=jax.random.PRNGKey(3))
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 96, 96, 3), np.uint8))

    out_all = det_all.detect_batch(det_all.params, frames)
    out_sub = det_sub.detect_batch(det_sub.params, frames)

    sub_classes = np.asarray(out_sub.classes[0])
    kept = sub_classes[np.asarray(out_sub.scores[0]) > 0]
    assert len(kept) > 0
    assert set(kept.tolist()) <= {PERSON, CAR}, set(kept.tolist())

    # scores for the watched classes agree with the full detector: compare
    # the top person-class score from both
    all_classes = np.asarray(out_all.classes[0])
    all_scores = np.asarray(out_all.scores[0])
    sub_scores = np.asarray(out_sub.scores[0])
    for label in (PERSON, CAR):
        a = all_scores[all_classes == label]
        s = sub_scores[sub_classes == label]
        if len(a) and len(s):
            assert abs(float(a.max()) - float(s.max())) < 1e-5
