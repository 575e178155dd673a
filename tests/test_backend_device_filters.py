"""JaxDetectorBackend with fused device filtering: per-camera tables gate
classes and the zones ride back with the detections."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.config.coco import coco_label_index
from watsor_tpu.detection.backend import JaxDetectorBackend
from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.ops.filter_device import threshold_tables, zone_tables

TINY = SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32,
                 score_threshold=0.0)

PERSON = coco_label_index('person')


@pytest.fixture(scope='module')
def detector():
    return build_detector(TINY, rng=jax.random.PRNGKey(0))


def _tables(detect_config):
    conf, area = threshold_tables(detect_config)
    zs, za = zone_tables(None, detect_config)
    return (conf, area, zs, za)


def test_device_filters_gate_classes(detector):
    # camera watches ONLY person with zero thresholds
    tables = {'cam1': _tables([
        {'person': {'confidence': 0, 'area': 0, 'zones': []}}])}
    backend = JaxDetectorBackend(detector, camera_tables=tables)
    frames = np.random.RandomState(0).randint(0, 255, (1, 96, 96, 3),
                                              np.uint8)
    out = backend.detect_batch(frames, senders=['cam1'])
    assert len(out) == 6, 'device-filtered backend must return zones'
    boxes, scores, classes, valid, ms, zones = out
    kept = classes[0][scores[0] > 0]
    assert len(kept) > 0, 'zero thresholds should keep person detections'
    assert set(kept.tolist()) == {PERSON}, \
        'only the watched class may survive: {}'.format(set(kept.tolist()))


def test_without_senders_no_filtering(detector):
    tables = {'cam1': _tables([
        {'person': {'confidence': 0, 'area': 0, 'zones': []}}])}
    backend = JaxDetectorBackend(detector, camera_tables=tables)
    frames = np.random.RandomState(0).randint(0, 255, (1, 96, 96, 3),
                                              np.uint8)
    out = backend.detect_batch(frames)          # no senders -> raw path
    assert len(out) == 5
