"""Warmup must compile the program production actually runs.

With camera filter tables configured (the production default — device
filters are on unless WATSOR_DEVICE_FILTERS=0), every live batch takes the
FILTERED fused step (detect + device filters + pack), which is a different
XLA program than the plain fused step. A warmup that only traces the plain
program leaves a full model compile to happen inline on the first real
camera batch — minutes on the target hardware, mid-serving, after `ready`
was already signalled (the exact pathology the warmup gate and
WATSOR_MIN_BUCKET exist to prevent).

Round-4 review finding; backend.py JaxDetectorBackend.warmup /
FleetBackend.warmup. Also pins the WATSOR_DEVICE_POOL count parsing and
the dryrun pad-path batch helper fixed in the same pass.
"""

import numpy as np
import pytest

from watsor_tpu.detection.backend import JaxDetectorBackend


def _tiny_det_and_tables():
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
    return det, tables


@pytest.mark.slow
def test_warmup_compiles_filtered_program(monkeypatch):
    monkeypatch.setenv('WATSOR_PACKED_FETCH', '1')
    det, tables = _tiny_det_and_tables()
    backend = JaxDetectorBackend(det, camera_tables=tables)
    assert backend._fused_filtered._cache_size() == 0
    backend.warmup(batch=2)
    # the filtered program (the one every camera batch will run) is warm;
    # the plain program — which never executes in a filtered deployment —
    # was not compiled at all
    assert backend._fused_filtered._cache_size() == 1
    assert backend._fused_plain._cache_size() == 0
    # and the warmed shape is the serving shape: a real batch is a cache
    # hit, not a new trace
    frames = np.zeros((2, 96, 96, 3), np.uint8)
    backend.detect_batch(frames, senders=['cam1', 'cam1'])
    assert backend._fused_filtered._cache_size() == 1


@pytest.mark.slow
def test_warmup_plain_when_no_tables(monkeypatch):
    monkeypatch.setenv('WATSOR_PACKED_FETCH', '1')
    det, _ = _tiny_det_and_tables()
    backend = JaxDetectorBackend(det)
    backend.warmup(batch=2)
    assert backend._fused_plain._cache_size() == 1


@pytest.mark.slow
def test_fleet_warmup_compiles_filtered_program(monkeypatch):
    import jax
    from jax.sharding import Mesh

    from watsor_tpu.detection.backend import FleetBackend
    from watsor_tpu.parallel.fleet import FleetDetector

    monkeypatch.setenv('WATSOR_PACKED_FETCH', '1')
    det, tables = _tiny_det_and_tables()
    devices = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devices, ('data', 'model'))
    fleet = FleetDetector(mesh, det.config, detector=det)
    backend = FleetBackend(fleet, camera_tables=tables)
    backend.warmup(batch=2)
    assert backend._fused_filtered._cache_size() == 1
    assert backend._fused_plain._cache_size() == 0


def test_fleet_min_bucket_floors_dispatch():
    """WATSOR_MIN_BUCKET must floor FleetBackend's bucket choice exactly
    like JaxDetectorBackend's (round-4 review finding: the knob was
    silently a no-op in fleet mode)."""
    from typing import Any, NamedTuple

    import jax
    from jax.sharding import Mesh

    from watsor_tpu.detection.backend import FleetBackend

    class _Out(NamedTuple):
        boxes: Any
        scores: Any
        classes: Any
        valid: Any

    class _Cfg(NamedTuple):
        input_size: int = 32

    class _FakeFleet:
        config = _Cfg()
        params = {}

        def __init__(self, mesh):
            self.mesh = mesh
            self.seen = []

        class detector:        # no .lower -> packed, non-fused path
            @staticmethod
            def detect_batch(params, x):
                raise AssertionError('unused')

        def detect(self, frames):
            b = frames.shape[0]
            self.seen.append(b)
            return _Out(np.zeros((b, 10, 4), np.float32),
                        np.zeros((b, 10), np.float32),
                        np.zeros((b, 10), np.int32),
                        np.zeros((b,), np.int32))

    devices = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devices, ('data', 'model'))
    fleet = _FakeFleet(mesh)
    backend = FleetBackend(fleet, min_batch=5)
    backend.detect_batch(np.zeros((1, 32, 32, 3), np.uint8))
    backend.detect_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert fleet.seen == [8, 8], fleet.seen      # bucket(5) = 8

    fleet2 = _FakeFleet(mesh)
    backend2 = FleetBackend(fleet2)              # default: floor = data
    backend2.detect_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert fleet2.seen == [4], fleet2.seen       # bucket(3) = 4


def test_device_pool_bad_count_skips_entry(monkeypatch, caplog):
    """A malformed count in WATSOR_DEVICE_POOL must warn and degrade like
    the unknown-platform path, not crash startup (round-4 review
    finding)."""
    from watsor_tpu.detection.detector import resolve_device_pool

    for spec in ('cpu:two', 'cpu:-1', 'cpu:0', 'cpu:1.5'):
        devices = resolve_device_pool(spec)
        assert len(devices) == 1, (spec, devices)   # CPU fallback
    assert len(resolve_device_pool('cpu:2')) == 2


def test_pad_path_batch_choice():
    import __graft_entry__ as g

    for data in (1, 2, 3, 4, 8):
        n = g._pad_path_batch(data)
        if data > 1:
            assert n % data != 0, (data, n)
        else:
            assert n == 3      # pads to bucket 4 on a data=1 mesh
