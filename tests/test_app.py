"""End-to-end application test: a synthetic camera + the analytic shape
detector behind the real composition root and HTTP server. Covers the
startup call stack, /health, /metrics, /snapshot, MJPEG streaming and
shutdown — the reference's integration strategy with zero ML and no
hardware (SURVEY.md §4)."""

import json
import threading
import time
import urllib.request

import pytest

from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.testing.shapes import ShapeDetectorBackend

CONFIG = """
http:
  port: {port}
detect:
  - person:
      confidence: 10
      area: 1
cameras:
  - synth1:
      width: 160
      height: 120
      input: synthetic://shapes
      detect:
        - person:
            confidence: 10
            area: 1
        - car:
            confidence: 10
            area: 1
      ffmpeg:
        decoder:
          - -i
          - -f
          - rawvideo
          - -pix_fmt
          - rgb24
"""


@pytest.fixture(scope='module')
def app_url(tmp_path_factory):
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()

    config_file = tmp_path_factory.mktemp('cfg') / 'config.yaml'
    config_file.write_text(CONFIG.format(port=port))

    args = _parse_commandline_arguments(['-c', str(config_file)])
    app = Application(args, backend_factory=lambda device:
                      ShapeDetectorBackend((120, 160)))
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()

    import json as _json
    url = 'http://127.0.0.1:{}'.format(port)
    deadline = time.time() + 15
    while time.time() < deadline:
        try:
            metrics = _json.loads(urllib.request.urlopen(
                url + '/metrics', timeout=1).read())
            if metrics['cameras']:       # HTTP now serves before _setup
                break
        except Exception:
            pass
        time.sleep(0.2)
    else:
        pytest.fail('application HTTP server did not come up')
    yield url
    app._stop_main.set()
    thread.join(20)


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as response:
        return response.read()


def test_health(app_url):
    assert _get(app_url + '/health') == b'UP'


def test_home_page_lists_camera(app_url):
    body = _get(app_url + '/').decode()
    assert 'synth1' in body and '/video/mjpeg/synth1' in body


def test_metrics_shape_and_progress(app_url):
    time.sleep(2)
    metrics = json.loads(_get(app_url + '/metrics'))
    by_name = {c['name']: c for c in metrics['cameras']}
    assert 'synth1' in by_name
    cam = by_name['synth1']
    # reference JSON shape (/root/reference/watsor/main.py:221-253)
    assert set(cam) >= {'name', 'fps', 'buffer_in', 'buffer_out'}
    assert set(cam['fps']) >= {'decoder', 'sieve', 'visual_effects',
                               'snapshot'}
    assert cam['fps']['decoder'] > 0, "decoder not producing frames"
    assert len(metrics['detectors']) >= 1
    assert metrics['detectors'][0]['fps'] > 0, "detector not consuming"


def test_mjpeg_stream_delivers_frames(app_url):
    request = urllib.request.urlopen(app_url + '/video/mjpeg/synth1',
                                     timeout=10)
    data = request.read(40000)
    request.close()
    assert b'--frame' in data
    assert b'\xff\xd8' in data, "no JPEG SOI marker in MJPEG stream"


def test_snapshot_after_detection(app_url):
    deadline = time.time() + 15
    last_status = None
    while time.time() < deadline:
        try:
            data = _get(app_url + '/snapshot/synth1/person')
            assert data[:2] == b'\xff\xd8'
            return
        except urllib.error.HTTPError as e:
            last_status = e.code
            time.sleep(0.5)
    pytest.fail('snapshot never became available (last status {})'
                .format(last_status))


def test_profiler_endpoint(app_url):
    import os
    body = json.loads(_get(app_url + '/profiler?seconds=0.2', timeout=15))
    assert os.path.isdir(body['trace_dir'])


def test_unknown_camera_404(app_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(app_url + '/video/mjpeg/nope')
    assert err.value.code == 404


def _first_jpeg_shape(data):
    import cv2
    import numpy as np
    import re
    m = re.search(rb'\xff\xd8\xff.*?\xff\xd9', data, re.DOTALL)
    assert m, 'no complete JPEG in stream'
    img = cv2.imdecode(np.frombuffer(m.group(0), np.uint8),
                       cv2.IMREAD_COLOR)
    assert img is not None
    return img.shape[:2]


def test_mjpeg_scale_variant(app_url):
    """?scale=2 serves at half resolution via the fused-downscale
    persistent encoder (round-5 viewer path)."""
    request = urllib.request.urlopen(
        app_url + '/video/mjpeg/synth1?scale=2', timeout=10)
    data = request.read(20000)
    request.close()
    # 160x120 camera, MJPEG rounds odd dims down to even
    assert _first_jpeg_shape(data) == (60, 80)


def test_mjpeg_detect_res_variant(app_url):
    request = urllib.request.urlopen(
        app_url + '/video/mjpeg/synth1?res=detect', timeout=10)
    data = request.read(30000)
    request.close()
    # the detect plane is the MODEL input resolution (here SSD 300x300)
    assert _first_jpeg_shape(data) == (300, 300)


def test_mjpeg_fps_cap(app_url):
    """?fps=2 bounds delivered (non-keep-alive) parts to ~2/s."""
    import re
    request = urllib.request.urlopen(
        app_url + '/video/mjpeg/synth1?fps=2', timeout=10)
    t0 = time.time()
    data = b''
    while time.time() - t0 < 2.5:
        data += request.read(2048)
    request.close()
    elapsed = time.time() - t0
    frames = [int(n) for n in
              re.findall(rb'Content-Length: (\d+)', data) if int(n) > 0]
    assert len(frames) >= 1
    assert len(frames) <= 2 * elapsed + 2, \
        'fps cap not enforced: %d parts in %.1fs' % (len(frames), elapsed)


def test_mjpeg_bad_query_param_400(app_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(app_url + '/video/mjpeg/synth1?scale=banana')
    assert err.value.code == 400


def test_metrics_prometheus_format(app_url):
    body = _get(app_url + '/metrics?format=prometheus').decode()
    assert '# TYPE watsor_camera_fps gauge' in body
    assert 'watsor_camera_fps{camera="synth1",stage="decoder"}' in body
    assert 'watsor_detector_inference_ms{' in body
    assert 'watsor_detector_latency_ms{' in body and 'quantile="p95"' in body
    # every sample line parses as <name>{<labels>} <float>
    for line in body.strip().splitlines():
        if line.startswith('#'):
            continue
        name_labels, value = line.rsplit(' ', 1)
        float(value)
        assert name_labels.endswith('}') and '{' in name_labels
