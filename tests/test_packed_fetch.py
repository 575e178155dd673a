"""Packed single-fetch results (backend.py _pack_outputs/_unpack_outputs).

resolve() fetches ONE [B, N+1, 7] f32 array instead of 4-6 separate
device buffers — each fetch is a host-device round trip (a measured
~27 ms tunnel RTT each on this rig; a sync each on PCIe). The packing
must be bit-exact: boxes stay f32, classes/valid are small ints exact in
f32, zone hits ride as a <=10-bit bitmask (exact in f32's 24-bit
mantissa).
"""

from typing import Any, NamedTuple

import numpy as np
import pytest

from watsor_tpu.detection.backend import (JaxDetectorBackend, _pack_outputs,
                                          _unpack_outputs)
from watsor_tpu.runtime.frames import MAX_ZONES


class _Out(NamedTuple):
    boxes: Any
    scores: Any
    classes: Any
    valid: Any


def _random_out(rng, b=4, n=100):
    boxes = rng.rand(b, n, 4).astype(np.float32)
    scores = np.where(rng.rand(b, n) > 0.5,
                      rng.rand(b, n).astype(np.float32), 0.0)
    classes = np.where(scores > 0, rng.randint(1, 91, (b, n)), 0) \
        .astype(np.int32)
    valid = (scores > 0).sum(axis=1).astype(np.int32)
    return _Out(boxes, scores.astype(np.float32), classes, valid)


def test_pack_roundtrip_no_zones():
    rng = np.random.RandomState(0)
    out = _random_out(rng)
    packed = np.asarray(_pack_outputs(out, None))
    boxes, scores, classes, valid, zones = _unpack_outputs(
        packed, 3, False, MAX_ZONES)
    np.testing.assert_array_equal(boxes, out.boxes[:3])
    np.testing.assert_array_equal(scores, out.scores[:3])
    np.testing.assert_array_equal(classes, out.classes[:3])
    np.testing.assert_array_equal(valid, out.valid[:3])
    assert zones is None


def test_pack_roundtrip_with_zones():
    rng = np.random.RandomState(1)
    out = _random_out(rng)
    zones_hit = rng.rand(4, 100, MAX_ZONES) > 0.7
    packed = np.asarray(_pack_outputs(out, zones_hit))
    boxes, scores, classes, valid, zones = _unpack_outputs(
        packed, 4, True, MAX_ZONES)
    np.testing.assert_array_equal(zones, zones_hit)
    np.testing.assert_array_equal(boxes, out.boxes)
    np.testing.assert_array_equal(classes, out.classes)


def test_unpacked_arrays_are_writable():
    # the zone refiner mutates scores/classes/valid/zones in place
    rng = np.random.RandomState(2)
    out = _random_out(rng)
    zones_hit = rng.rand(4, 100, MAX_ZONES) > 0.7
    packed = np.asarray(_pack_outputs(out, zones_hit))
    boxes, scores, classes, valid, zones = _unpack_outputs(
        packed, 4, True, MAX_ZONES)
    for arr in (scores, classes, valid, zones):
        arr.flat[0] = 0          # must not raise


class _FakeConfig(NamedTuple):
    input_size: int = 32


class _FakeDetector:
    config = _FakeConfig()
    params = {}

    def __init__(self, out):
        self._out = out

    def detect_batch(self, params, x):
        return self._out


def test_backend_packed_equals_unpacked(monkeypatch):
    rng = np.random.RandomState(3)
    out = _random_out(rng)
    frames = np.zeros((3, 32, 32, 3), np.uint8)

    monkeypatch.setenv('WATSOR_PACKED_FETCH', '1')
    packed_result = JaxDetectorBackend(_FakeDetector(out)) \
        .detect_batch(frames)
    monkeypatch.setenv('WATSOR_PACKED_FETCH', '0')
    plain_result = JaxDetectorBackend(_FakeDetector(out)) \
        .detect_batch(frames)

    for a, b in zip(packed_result[:4], plain_result[:4]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_single_dispatch_equals_eager_real_detector(monkeypatch):
    """The fused detect+filter+pack program must be bit-identical to the
    eager per-field path on a REAL (tiny) detector, zones included."""
    import jax
    import jax.numpy as jnp

    from watsor_tpu.models.ssd import SSDConfig, build_detector
    from watsor_tpu.ops.filter_device import threshold_tables, zone_tables

    tiny = SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                     extra_features=(32, 32, 32, 32), dtype=jnp.float32,
                     score_threshold=0.0)
    det = build_detector(tiny, rng=jax.random.PRNGKey(0))
    detect = [{'person': {'confidence': 0, 'area': 0, 'zones': []}}]
    tables = {'cam1': threshold_tables(detect) + zone_tables(None, detect)}
    frames = np.random.RandomState(0).randint(0, 255, (2, 96, 96, 3),
                                              np.uint8)

    monkeypatch.setenv('WATSOR_PACKED_FETCH', '1')
    fused_backend = JaxDetectorBackend(det, camera_tables=tables)
    assert fused_backend._fused_filtered is not None
    fused = fused_backend.detect_batch(frames, senders=['cam1', 'cam1'])

    monkeypatch.setenv('WATSOR_PACKED_FETCH', '0')
    eager = JaxDetectorBackend(det, camera_tables=tables) \
        .detect_batch(frames, senders=['cam1', 'cam1'])

    assert len(fused) == len(eager) == 6
    for i, (a, b) in enumerate(zip(fused[:4], eager[:4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg='field {}'.format(i))
    np.testing.assert_array_equal(np.asarray(fused[5]),
                                  np.asarray(eager[5]))
