"""Multi-detector (non-fleet) topology: several ObjectDetector tasks
sharing ONE balanced queue through the real Application — the reference's
actual scale-out shape (one detector process per accelerator, all draining
the same queue, /root/reference/watsor/detection/detector.py:40-55,
README.md:455-457) — plus the heterogeneous-pool selection that feeds it.
"""

import base64
import json
import threading
import time
import urllib.request
from time import sleep

import pytest

from watsor_tpu.detection.detector import resolve_device_pool
from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.testing.shapes import ShapeDetectorBackend


# -- pool selection ---------------------------------------------------------

def test_pool_default_is_single_cpu_without_tpu():
    devices = resolve_device_pool('')
    assert len(devices) == 1 and devices[0].platform == 'cpu'


def test_pool_spec_counts_devices():
    devices = resolve_device_pool('cpu:2')
    assert len(devices) == 2
    assert all(d.platform == 'cpu' for d in devices)
    assert devices[0] != devices[1]


def test_pool_spec_mixes_platforms_and_skips_missing():
    """``tpu,cpu:1`` on a TPU host yields every chip plus one CPU detector
    (the reference's EdgeTPU+GPU+CPU union); on this CPU-only rig the tpu
    entry is skipped with a warning and the CPU entry survives."""
    devices = resolve_device_pool('tpu,cpu:1')
    assert len(devices) == 1 and devices[0].platform == 'cpu'


def test_pool_spec_deduplicates():
    devices = resolve_device_pool('cpu:2,cpu:3')
    assert len(devices) == 3


def test_pool_env_is_honored(monkeypatch):
    monkeypatch.setenv('WATSOR_DEVICE_POOL', 'cpu:2')
    assert len(resolve_device_pool()) == 2


# -- the real Application with two detectors --------------------------------

class _PacedShapeBackend(ShapeDetectorBackend):
    """Shape backend with a per-batch pause so neither detector thread can
    drain the queue alone (mirrors real device latency)."""

    def __init__(self, device):
        super().__init__((64, 96))
        self.device_name = '{} {}'.format(device.platform.upper(),
                                          getattr(device, 'id', 0))

    def detect_batch(self, images_u8, senders=None):
        sleep(0.03)
        return super().detect_batch(images_u8, senders=senders)


CONFIG = """
http:
  port: {port}
cameras:
  - cam1:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
  - cam2:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


@pytest.fixture(scope='module')
def multi_app(tmp_path_factory):
    import os
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    config_file = tmp_path_factory.mktemp('cfg') / 'config.yaml'
    config_file.write_text(CONFIG.format(port=port))
    os.environ['WATSOR_DEVICE_POOL'] = 'cpu:2'
    try:
        app = Application(
            _parse_commandline_arguments(['-c', str(config_file)]),
            backend_factory=_PacedShapeBackend)
        thread = threading.Thread(target=app.run, daemon=True)
        thread.start()
        url = 'http://127.0.0.1:{}'.format(port)
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                urllib.request.urlopen(url + '/health', timeout=1)
                break
            except Exception:
                time.sleep(0.2)
        yield url, app
        app._stop_main.set()
        thread.join(15)
    finally:
        os.environ.pop('WATSOR_DEVICE_POOL', None)


def _metrics(url):
    with urllib.request.urlopen(url + '/metrics', timeout=5) as resp:
        return json.load(resp)


def test_two_detectors_share_the_queue(multi_app):
    """Both detector tasks must serve frames (load balancing across the
    pool) and /metrics must report each one separately."""
    url, app = multi_app
    deadline = time.time() + 60
    while time.time() < deadline:
        m = _metrics(url)
        dets = m.get('detectors', [])
        if len(dets) == 2 and all(d['fps'] > 0 for d in dets):
            break
        time.sleep(0.5)
    else:
        pytest.fail('both detectors never reported fps > 0: %r'
                    % (m.get('detectors'),))
    assert len(app._detectors) == 2
    names = [d['name'] for d in dets]
    assert len(set(names)) == 2, 'detector names not distinct: %r' % names
    assert all(d['inference_time'] > 0 for d in dets)


def test_fairness_across_cameras_with_two_detectors(multi_app):
    """The balanced queue's per-camera quota must keep serving every
    camera when two detectors drain it."""
    url, _ = multi_app
    deadline = time.time() + 60
    while time.time() < deadline:
        m = _metrics(url)
        cams = {c['name']: c['fps'] for c in m.get('cameras', [])}
        if len(cams) == 2 and \
                all(f['sieve'] > 0 for f in cams.values()):
            return
        time.sleep(0.5)
    pytest.fail('a camera starved under the two-detector pool: %r' % cams)
