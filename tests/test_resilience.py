"""Failure resilience: a camera whose source cannot be opened must not
take the application down — the decoder fails, the watchdog keeps
retrying, HTTP stays healthy, and the other camera keeps flowing (the
reference's watchdog/reconnect contract, SURVEY.md §5)."""

import json
import threading
import time
import urllib.request

import pytest

from watsor_tpu.io import native
from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.testing.shapes import ShapeDetectorBackend

CONFIG = """
http:
  port: {port}
cameras:
  - deadcam:
      width: 96
      height: 64
      input: /nonexistent/stream.mp4
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
  - livecam:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native video runtime unavailable')


def test_dead_camera_does_not_poison_the_app(tmp_path):
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(CONFIG.format(port=port))

    app = Application(_parse_commandline_arguments(['-c', str(config_file)]),
                      backend_factory=lambda device:
                      ShapeDetectorBackend((64, 96)))
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()
    url = 'http://127.0.0.1:{}'.format(port)
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            try:
                urllib.request.urlopen(url + '/health', timeout=1)
                break
            except Exception:
                time.sleep(0.2)
        else:
            pytest.fail('app did not come up with a dead camera configured')
        time.sleep(3)
        with urllib.request.urlopen(url + '/metrics', timeout=5) as resp:
            metrics = json.loads(resp.read())
        by_name = {c['name']: c for c in metrics['cameras']}
        assert by_name['livecam']['fps']['decoder'] > 5, \
            'healthy camera starved by the dead one'
        assert by_name['deadcam']['fps']['decoder'] == 0.0
        # the dead decoder is down but NOT shut down: the watchdog will
        # keep resurrecting it (automatic reconnect posture)
        dead = app._camera_by_name('deadcam').decoder
        assert not dead.is_shutdown()
    finally:
        app._stop_main.set()
        thread.join(20)
