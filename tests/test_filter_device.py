"""Device-side filter step: per-camera thresholds and zone tests agree
with the host filter cascade."""

import numpy as np
import pytest

import jax.numpy as jnp

from watsor_tpu.config.coco import coco_label_index
from watsor_tpu.filters.mask import ZoneMask
from watsor_tpu.ops.filter_device import (apply_filters_device,
                                          threshold_tables, zone_tables)

PERSON = coco_label_index('person')
CAR = coco_label_index('car')

CFG = [
    {'person': {'confidence': 60, 'area': 4, 'zones': []}},
    {'car': {'confidence': 80, 'area': 1, 'zones': []}},
]


def _batchify(*tables):
    return [jnp.asarray(t)[None] for t in tables]


def test_confidence_and_area_tables():
    conf, area = threshold_tables(CFG)
    assert conf[PERSON] == pytest.approx(0.6)
    assert area[CAR] == pytest.approx(0.01)
    assert np.isinf(conf[coco_label_index('dog')])


def test_filters_match_host_semantics():
    conf, area = threshold_tables(CFG)
    zs, za = zone_tables(None, CFG)
    boxes = np.array([[
        [0.1, 0.1, 0.4, 0.4],     # person, area 0.09 >= 0.04, conf ok
        [0.1, 0.1, 0.15, 0.15],   # person, area too small
        [0.2, 0.2, 0.5, 0.5],     # car, conf too low
        [0.2, 0.2, 0.5, 0.5],     # unwatched class
    ]], np.float32)
    scores = np.array([[0.9, 0.9, 0.5, 0.99]], np.float32)
    classes = np.array([[PERSON, PERSON, CAR,
                         coco_label_index('dog')]], np.int32)
    out_s, out_c, zones_hit, valid = apply_filters_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        *_batchify(conf, area, zs, za))
    assert int(valid[0]) == 1
    assert np.asarray(out_s)[0].tolist() == [np.float32(0.9), 0, 0, 0]


def test_zone_gating_matches_zonemask():
    # two zones; person allowed only in zone 2
    alpha = np.zeros((100, 200), np.uint8)
    alpha[10:40, 10:60] = 255      # zone 1
    alpha[60:90, 140:190] = 255    # zone 2
    zone_mask = ZoneMask(alpha, (100, 200, 3))
    cfg = [{'person': {'confidence': 10, 'area': 0.5, 'zones': [2]}},
           {'car': {'confidence': 10, 'area': 0.5, 'zones': []}}]
    conf, area = threshold_tables(cfg)
    zs, za = zone_tables(zone_mask, cfg)

    boxes = np.array([[
        [0.15, 0.075, 0.35, 0.175],   # in zone 1 -> person dropped
        [0.65, 0.75, 0.85, 0.9],      # in zone 2 -> person kept
        [0.45, 0.35, 0.55, 0.6],      # outside zones -> dropped
        [0.15, 0.075, 0.35, 0.175],   # car: all zones allowed -> kept
    ]], np.float32)
    scores = np.full((1, 4), 0.9, np.float32)
    classes = np.array([[PERSON, PERSON, PERSON, CAR]], np.int32)
    out_s, out_c, zones_hit, valid = apply_filters_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        *_batchify(conf, area, zs, za))
    assert np.asarray(out_c)[0].tolist() == [0, PERSON, 0, CAR]
    # zone indices recorded for the kept detections
    hits = np.asarray(zones_hit)[0]
    assert hits[1, 1], 'kept person should register zone 2'
    assert hits[3, 0], 'kept car should register zone 1'


def test_zones_disabled_passes_everything():
    cfg = [{'person': {'confidence': 10, 'area': 1, 'zones': [3]}}]
    conf, area = threshold_tables(cfg)
    zs, za = zone_tables(None, cfg)   # no mask configured
    boxes = np.array([[[0.1, 0.1, 0.6, 0.6]]], np.float32)
    scores = np.array([[0.9]], np.float32)
    classes = np.array([[PERSON]], np.int32)
    _, out_c, _, valid = apply_filters_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        *_batchify(conf, area, zs, za))
    assert int(valid[0]) == 1
