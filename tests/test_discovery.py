"""Accelerator responsiveness probe (watsor_tpu/detection/discovery.py)
— the startup failure-detection added after a live wedged-tunnel event:
a hung backend init blocks jax.devices() forever and holds a global
lock, so the CPU fallback must be decided BEFORE the parent touches
JAX. Reference contract: CPU fallback when accelerators are unusable
(/root/reference/watsor/detection/detector.py:48-50).
"""

import logging
import sys

import jax
import pytest

from watsor_tpu.detection import discovery


def test_explicit_platform_skips_probe(monkeypatch):
    monkeypatch.setenv('WATSOR_PLATFORM', 'cpu')
    assert discovery.ensure_responsive_backend(
        _cmd=[sys.executable, '-c', 'raise SystemExit(1)'],
        _platforms='axon,cpu') is None


def test_cpu_pinned_platforms_skip_probe(monkeypatch):
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    assert discovery.ensure_responsive_backend(
        _cmd=[sys.executable, '-c', 'raise SystemExit(1)'],
        _platforms='cpu') is None


def test_auto_select_is_probed(monkeypatch):
    """'' (auto-select) is the state a production container boots in — a
    wedged runtime hangs auto-select exactly like an explicit choice, so
    the probe must engage there too."""
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    pinned = {}
    monkeypatch.setattr(jax.config, 'update',
                        lambda k, v: pinned.setdefault(k, v))
    out = discovery.ensure_responsive_backend(
        timeout_s=30,
        _cmd=[sys.executable, '-c', 'raise SystemExit(1)'],
        _platforms='')
    assert out == 'cpu'
    assert pinned == {'jax_platforms': 'cpu'}


def test_zero_timeout_disables(monkeypatch):
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    monkeypatch.setenv(discovery.PROBE_TIMEOUT_ENV, '0')
    assert discovery.ensure_responsive_backend(
        _cmd=[sys.executable, '-c', 'raise SystemExit(1)'],
        _platforms='axon,cpu') is None


def test_healthy_probe_leaves_platform_alone(monkeypatch):
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    monkeypatch.delenv(discovery.PROBE_TIMEOUT_ENV, raising=False)
    assert discovery.ensure_responsive_backend(
        timeout_s=30,
        _cmd=[sys.executable, '-c', 'print("tpu")'],
        _platforms='axon,cpu') is None


def test_failing_probe_pins_cpu(monkeypatch, caplog):
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    pinned = {}
    monkeypatch.setattr(jax.config, 'update',
                        lambda k, v: pinned.setdefault(k, v))
    with caplog.at_level(logging.WARNING):
        out = discovery.ensure_responsive_backend(
            logger=logging.getLogger('test'), timeout_s=30,
            _cmd=[sys.executable, '-c',
                  'import sys; sys.exit("UNAVAILABLE: tunnel down")'],
            _platforms='axon,cpu')
    assert out == 'cpu'
    assert pinned == {'jax_platforms': 'cpu'}
    assert 'serving on CPU' in caplog.text


def test_hanging_probe_pins_cpu(monkeypatch):
    monkeypatch.delenv('WATSOR_PLATFORM', raising=False)
    pinned = {}
    monkeypatch.setattr(jax.config, 'update',
                        lambda k, v: pinned.setdefault(k, v))
    out = discovery.ensure_responsive_backend(
        timeout_s=0.5,
        _cmd=[sys.executable, '-c', 'import time; time.sleep(30)'],
        _platforms='axon,cpu')
    assert out == 'cpu'
    assert pinned == {'jax_platforms': 'cpu'}


def test_factory_survives_backend_init_failure(monkeypatch):
    """create_object_detectors falls back to CPU when jax.devices()
    raises (fast-failure mode of a broken accelerator runtime)."""
    from watsor_tpu.detection.detector import create_object_detectors

    real_devices = jax.devices
    calls = {'n': 0}

    def flaky_devices(*args):
        if not args and calls['n'] == 0:
            calls['n'] += 1
            raise RuntimeError("Unable to initialize backend 'axon'")
        return real_devices(*args)

    monkeypatch.setattr(jax, 'devices', flaky_devices)
    monkeypatch.setattr(jax.config, 'update', lambda k, v: None)

    backends = []

    def backend_factory(device):
        backends.append(device)

        class _Stub:
            input_hw = (8, 8)
            device_name = 'stub'
        return _Stub()

    detectors = create_object_detectors({'cam': object()},
                                        {'cam': object()},
                                        backend_factory)
    assert len(detectors) == 1
    assert backends and backends[0].platform == 'cpu'
