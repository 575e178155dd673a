"""Filter cascade unit tests (contract from the reference's test_filter.py:
confidence accept/reject, area percentage, zone hit via a generated mask,
track confirmation + merge)."""

import numpy as np
import pytest

from watsor_tpu.config.coco import coco_label_index
from watsor_tpu.filters.mask import MaskFilter, ZoneMask, get_alpha_channel
from watsor_tpu.filters.static import AreaFilter, ConfidenceFilter
from watsor_tpu.filters.track import TrackFilter
from watsor_tpu.runtime.frames import DETECTION_DTYPE

PERSON = coco_label_index('person')
CAR = coco_label_index('car')
FRAME = (100, 200, 3)   # h, w, c


def make_detections(*specs):
    """specs: (label, confidence, (ymin, xmin, ymax, xmax))"""
    out = np.zeros(len(specs), DETECTION_DTYPE)
    for i, (label, conf, bbox) in enumerate(specs):
        out[i]['label'] = label
        out[i]['confidence'] = conf
        out[i]['bbox'] = bbox
    return out


DETECT_CFG = [
    {'person': {'confidence': 60, 'area': 10, 'zones': []}},
    {'car': {'confidence': 80, 'area': 5, 'zones': []}},
]


class TestConfidence:

    def test_per_class_thresholds(self):
        f = ConfidenceFilter(DETECT_CFG)
        d = make_detections(
            (PERSON, 0.65, (0, 0, 10, 10)),    # above 60% -> keep
            (PERSON, 0.55, (0, 0, 10, 10)),    # below -> drop
            (CAR, 0.85, (0, 0, 10, 10)),       # above 80% -> keep
            (CAR, 0.65, (0, 0, 10, 10)),       # below -> drop
        )
        assert f(d, FRAME).tolist() == [True, False, True, False]

    def test_unconfigured_class_dropped(self):
        f = ConfidenceFilter(DETECT_CFG)
        d = make_detections((coco_label_index('dog'), 0.99, (0, 0, 9, 9)))
        assert f(d, FRAME).tolist() == [False]


class TestArea:

    def test_percent_of_frame(self):
        f = AreaFilter(DETECT_CFG)
        # frame area = 20000; person needs >= 10% = 2000 px
        d = make_detections(
            (PERSON, 0.9, (0, 0, 50, 50)),    # 2500 px -> keep
            (PERSON, 0.9, (0, 0, 30, 30)),    # 900 px -> drop
            (CAR, 0.9, (0, 0, 40, 30)),       # 1200 px >= 5% (1000) -> keep
        )
        assert f(d, FRAME).tolist() == [True, False, True]


class TestMask:

    def _mask(self, zones_cfg=None):
        # 32-bit mask: two opaque square zones; zone 1 nearer the origin
        alpha = np.zeros((100, 200), np.uint8)
        alpha[10:40, 10:60] = 255      # zone 1
        alpha[60:90, 140:190] = 255    # zone 2
        image = np.dstack([np.zeros((100, 200, 3), np.uint8), alpha])
        cfg = [{'person': {'confidence': 50, 'area': 10,
                           'zones': zones_cfg or []}}]
        zone_mask = ZoneMask(get_alpha_channel(image), FRAME)
        return MaskFilter(cfg, zone_mask), zone_mask

    def test_alpha_channel_required(self):
        with pytest.raises(AssertionError):
            get_alpha_channel(np.zeros((4, 4, 3), np.uint8))

    def test_size_mismatch_asserts(self):
        alpha = np.zeros((50, 50), np.uint8)
        with pytest.raises(AssertionError):
            ZoneMask(alpha, FRAME)

    def test_zone_hit_and_indices(self):
        f, zm = self._mask()
        assert zm.num_zones == 2
        d = make_detections(
            (PERSON, 0.9, (15, 15, 35, 35)),    # inside zone 1
            (PERSON, 0.9, (65, 150, 85, 180)),  # inside zone 2
            (PERSON, 0.9, (45, 70, 55, 120)),   # outside all zones
        )
        keep = f(d, FRAME)
        assert keep.tolist() == [True, True, False]
        assert d['zones'][0][0] == 1 and d['num_zones'][0] == 1
        assert d['zones'][1][0] == 2 and d['num_zones'][1] == 1

    def test_zone_allow_list(self):
        f, _ = self._mask(zones_cfg=[2])
        d = make_detections(
            (PERSON, 0.9, (15, 15, 35, 35)),    # zone 1 only -> drop
            (PERSON, 0.9, (65, 150, 85, 180)),  # zone 2 -> keep
        )
        assert f(d, FRAME).tolist() == [False, True]


class TestTrack:

    def test_debounce_then_confirm_and_merge(self):
        track = TrackFilter([ConfidenceFilter(DETECT_CFG)], sensitivity=3)
        base = (10, 10, 60, 60)
        seen = []
        for i in range(4):
            bbox = tuple(v + i for v in base)   # slight drift
            d = make_detections((PERSON, 0.7 + 0.05 * i, bbox))
            kept, suspicious = track(d, FRAME)
            assert suspicious
            seen.append(len(kept))
        # sightings 1 and 2 are debounced; 3rd confirms
        assert seen == [0, 0, 1, 1]
        kept, _ = track(make_detections((PERSON, 0.7, (13, 13, 63, 63))),
                        FRAME)
        merged = kept[0]
        # union bbox over history, max confidence
        assert merged['bbox'][0] == 10 and merged['bbox'][2] == 63
        assert merged['confidence'] == pytest.approx(0.85)

    def test_gap_resets_consecutive_count(self):
        track = TrackFilter([], sensitivity=3)
        d = make_detections((PERSON, 0.9, (10, 10, 60, 60)))
        empty = np.zeros(0, DETECTION_DTYPE)
        assert len(track(d, FRAME)[0]) == 0
        assert len(track(d, FRAME)[0]) == 0
        track(empty, FRAME)                      # gap: track dropped
        assert len(track(d, FRAME)[0]) == 0      # count restarted
        assert len(track(d, FRAME)[0]) == 0
        assert len(track(d, FRAME)[0]) == 1

    def test_separate_classes_tracked_separately(self):
        track = TrackFilter([], sensitivity=2)
        d = make_detections((PERSON, 0.9, (10, 10, 60, 60)),
                            (CAR, 0.9, (12, 12, 58, 58)))
        track(d, FRAME)
        kept, _ = track(d, FRAME)
        assert sorted(kept['label'].tolist()) == [PERSON, CAR]
