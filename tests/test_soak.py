"""Short soak: four synthetic cameras through the full application for
~8 s — buffers must not saturate, every stage must make progress, and no
frame may need stale reclamation (the scheduler-health properties the
reference pins in its capacity tests, SURVEY.md §4)."""

import json
import logging
import threading
import time
import urllib.request

import pytest

from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.testing.shapes import ShapeDetectorBackend

CAMERA = """
  - cam{i}:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
        - car: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


def test_four_camera_soak(tmp_path):
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    config = 'http:\n  port: {}\ncameras:\n'.format(port) + ''.join(
        CAMERA.format(i=i) for i in range(4))
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(config)

    reclaims = []
    handler = logging.Handler()
    handler.emit = lambda record: reclaims.append(record) \
        if 'Reclaiming' in record.getMessage() else None
    logging.getLogger('watsor_tpu.frames').addHandler(handler)

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
        time.sleep(8)
        with urllib.request.urlopen(url + '/metrics', timeout=5) as resp:
            metrics = json.loads(resp.read())
        for cam in metrics['cameras']:
            assert cam['fps']['decoder'] > 5, \
                'decoder starved: {}'.format(cam)
            assert cam['fps']['sieve'] > 5, \
                'sieve starved: {}'.format(cam)
            assert cam['buffer_in'] < 90, \
                'ring saturated: {}'.format(cam)
        det = metrics['detectors'][0]
        assert det['fps'] > 20, 'detector underfed: {}'.format(det)
        assert det['latency_ms_p50'] < 1000
        assert not reclaims, 'stale frames were force-reclaimed'
    finally:
        app._stop_main.set()
        thread.join(20)
        logging.getLogger('watsor_tpu.frames').removeHandler(handler)
