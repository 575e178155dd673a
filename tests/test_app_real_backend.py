"""Application integration with the REAL JAX backend — no backend_factory
injection. Covers the model-building half of ``Application._setup``
(zoo build, active-label trimming, device-filter tables, the
WATSOR_QUANTIZE and WATSOR_FLEET branches) end-to-end, the analog of the
reference's gated real-detector test
(/root/reference/watsor/test/test_detect.py:22-52) — but runnable in CI on
the JAX CPU backend with the small shapes-geometry model.

Each variant boots the full Application (synthetic camera -> arena ->
JaxDetectorBackend/FleetBackend -> sieve -> snapshot/HTTP) and waits for
real inferences to flow through /metrics.
"""

import json
import socket
import threading
import time
import urllib.request

import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


from watsor_tpu.main import Application, _parse_commandline_arguments

CONFIG = """
http:
  port: {port}
cameras:
  - cam_r:
      width: 160
      height: 120
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
        - car: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


def _free_port():
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def _get_json(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as response:
        return json.loads(response.read())


def _drive_real_app(tmp_path, monkeypatch, env=(), deadline_s=300):
    """Boot the Application with the real zoo-built JAX detector and block
    until actual inferences flow; returns the final /metrics payload."""
    for key, value in env:
        monkeypatch.setenv(key, value)
    port = _free_port()
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(CONFIG.format(port=port))
    args = _parse_commandline_arguments([
        '-c', str(config_file), '--model', 'ssd_mobilenet_v2_shapes',
        '-m', str(tmp_path / 'no_weights')])
    app = Application(args)  # <- NO backend_factory: the real path
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()
    url = 'http://127.0.0.1:{}'.format(port)
    metrics = None
    try:
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            try:
                metrics = _get_json(url + '/metrics', timeout=2)
                detectors = metrics.get('detectors') or []
                if detectors and detectors[0]['fps'] > 0 and \
                        detectors[0]['inference_time'] > 0:
                    break
            except Exception:
                pass
            time.sleep(1.0)
        else:
            pytest.fail('no real inference flowed within {}s: {}'.format(
                deadline_s, metrics))
        # the rest of the graph runs off the real detections
        assert metrics['cameras'][0]['fps']['decoder'] > 0
        return app, metrics
    finally:
        app._stop_main.set()
        thread.join(30)


def test_real_jax_backend_end_to_end(tmp_path, monkeypatch):
    """Zoo build + active-label trimming + device filter tables, no
    injection anywhere (main.py model-building coverage)."""
    monkeypatch.delenv('WATSOR_QUANTIZE', raising=False)
    monkeypatch.delenv('WATSOR_FLEET', raising=False)
    app, metrics = _drive_real_app(tmp_path, monkeypatch)
    # one detector task per (virtual CPU) device, real backend name
    assert len(metrics['detectors']) >= 1
    assert all(d['name'].startswith(('CPU', 'TPU'))
               for d in metrics['detectors'])


def test_real_backend_int8_quantized(tmp_path, monkeypatch):
    """WATSOR_QUANTIZE=int8: int8 weights + fused dequant step boots and
    serves inferences through the full Application."""
    app, metrics = _drive_real_app(
        tmp_path, monkeypatch, env=[('WATSOR_QUANTIZE', 'int8')])
    assert metrics['detectors'][0]['inference_time'] > 0


def test_real_backend_fleet_sharded(tmp_path, monkeypatch):
    """WATSOR_FLEET=1: one sharded SPMD step over the 8-virtual-device
    mesh instead of per-device detector tasks."""
    monkeypatch.delenv('WATSOR_QUANTIZE', raising=False)
    app, metrics = _drive_real_app(
        tmp_path, monkeypatch, env=[('WATSOR_FLEET', '1')])
    names = [d['name'] for d in metrics['detectors']]
    assert any('mesh' in n.lower() or 'fleet' in n.lower()
               for n in names), names
    assert len(metrics['detectors']) == 1
