"""WATSOR_MIN_BUCKET: pin the batch-bucket floor so an N-camera deployment
compiles exactly ONE program shape (backend.py JaxDetectorBackend).

Without a floor, a partial batch (frames from fewer cameras than usual)
pads to a SMALLER bucket the first time it occurs and pays an inline jit
compile mid-serving — minutes over a cold cache. The floor trades a few
hundred KB of padded H2D per step for shape determinism.
"""

from typing import Any, NamedTuple

import numpy as np
import pytest

from watsor_tpu.detection.backend import JaxDetectorBackend


class _Out(NamedTuple):
    boxes: Any
    scores: Any
    classes: Any
    valid: Any


class _FakeConfig(NamedTuple):
    input_size: int = 32


class _FakeDetector:
    """Records every batch shape the backend actually dispatches."""

    config = _FakeConfig()
    params = {}

    def __init__(self):
        self.seen = []

    def detect_batch(self, params, x):
        b = int(np.asarray(x).shape[0])
        self.seen.append(b)
        return _Out(np.zeros((b, 10, 4), np.float32),
                    np.zeros((b, 10), np.float32),
                    np.zeros((b, 10), np.int32),
                    np.zeros((b,), np.int32))


def test_min_bucket_floors_small_batches():
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake, min_batch=5)
    backend.detect_batch(np.zeros((1, 32, 32, 3), np.uint8))
    backend.detect_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert fake.seen == [8, 8], fake.seen  # bucket(5) = 8


def test_min_bucket_does_not_cap_large_batches():
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake, min_batch=4)
    backend.detect_batch(np.zeros((13, 32, 32, 3), np.uint8))
    assert fake.seen == [16], fake.seen


def test_min_bucket_clamped_to_max_batch():
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake, max_batch=32, min_batch=128)
    backend.detect_batch(np.zeros((1, 32, 32, 3), np.uint8))
    assert fake.seen == [32], fake.seen


def test_min_bucket_env(monkeypatch):
    monkeypatch.setenv('WATSOR_MIN_BUCKET', '16')
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake)
    backend.warmup(batch=2)
    backend.detect_batch(np.zeros((2, 32, 32, 3), np.uint8))
    assert fake.seen == [16, 16], fake.seen


def test_min_bucket_env_malformed_warns_and_defaults(monkeypatch, caplog):
    """A malformed WATSOR_MIN_BUCKET ('auto', '1.5') must not crash
    detector startup — warn and fall back to 1, matching the
    warn-and-skip posture of WATSOR_DEVICE_POOL parsing."""
    import logging

    for bad in ('auto', '1.5'):
        monkeypatch.setenv('WATSOR_MIN_BUCKET', bad)
        fake = _FakeDetector()
        with caplog.at_level(logging.WARNING, 'watsor_tpu.detector'):
            backend = JaxDetectorBackend(fake)
        assert any('WATSOR_MIN_BUCKET' in r.message for r in caplog.records)
        caplog.clear()
        backend.detect_batch(np.zeros((3, 32, 32, 3), np.uint8))
        assert fake.seen == [4], (bad, fake.seen)


def test_default_unchanged():
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake)
    backend.detect_batch(np.zeros((3, 32, 32, 3), np.uint8))
    assert fake.seen == [4], fake.seen


def test_results_sliced_to_real_batch():
    fake = _FakeDetector()
    backend = JaxDetectorBackend(fake, min_batch=8)
    boxes, scores, classes, valid, _ms = backend.detect_batch(
        np.zeros((2, 32, 32, 3), np.uint8))
    assert boxes.shape[0] == 2 and valid.shape == (2,)


def test_auto_min_bucket(monkeypatch):
    """Deployment default: TPU backends pin bucket(cameras); CPU backends
    (incl. the CPU member of a heterogeneous pool — padded rows cost real
    per-row conv time there) keep unfloored buckets; an explicit
    WATSOR_MIN_BUCKET always wins."""
    from watsor_tpu.detection.backend import auto_min_bucket

    monkeypatch.delenv('WATSOR_MIN_BUCKET', raising=False)
    assert auto_min_bucket('tpu', 12) == 12
    assert auto_min_bucket('tpu', 0) == 1
    assert auto_min_bucket('cpu', 12) is None
    monkeypatch.setenv('WATSOR_MIN_BUCKET', '4')
    assert auto_min_bucket('tpu', 12) is None   # env wins
