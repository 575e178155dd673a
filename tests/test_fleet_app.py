"""Application-level fleet equality: the 32-camera graph (zones + fused
device filters + exact zone refinement + device render + MQTT) runs once
with WATSOR_FLEET=1 (one SPMD step over the 8-virtual-device CPU mesh) and
once single-device, and must publish IDENTICAL detections camera by camera.

Round-2 pinning of fleet-vs-single equality stopped at the backend
(tests/test_fleet.py); this closes the loop at the surface an operator
sees — the MQTT detail payloads — through the REAL composition root. The
``synthetic://static`` source makes the comparison well-defined: every
frame of a camera carries identical pixels, so two runs converge to the
same steady-state detections regardless of timing, drops or batch
composition. TRT_FLOAT_PRECISION=32 removes bfloat16 reduction-order blur
(as the backend-level equality test does)."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.models import zoo
from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.testing.broker import MiniBroker

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason='needs 8 virtual devices')]

N_CAMS = 32
W, H = 96, 64

# a real (small) JAX model so the fleet path actually shards a jitted step;
# registered under a test-only name so `model:` resolves it
TINY = SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32)

CAMERA = """
  - cam{i:02d}:
      width: {w}
      height: {h}
      input: synthetic://static?seed={i}
      mask: {mask}
      detect:
        - person: {{confidence: 10, area: 1, zones: [1]}}
        - bicycle: {{confidence: 10, area: 1}}
        - car: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


def _write_mask(path):
    import cv2
    image = np.zeros((H, W, 4), np.uint8)
    image[:, :, :3] = 200
    image[4:H - 4, 4:W - 28, 3] = 255    # zone 1: most of the frame
    cv2.imwrite(path, image)


def _details_key(payload):
    """Detection content of a details payload, timestamp stripped."""
    body = json.loads(payload)
    return tuple(sorted(
        (d['c'], tuple(d['b']), tuple(d.get('z', []))) for d in body['d']))


def _run_app(tmp_path, fleet):
    """Boot the full application, enable MQTT details on every camera,
    collect one steady-state detail payload per (camera, class), and
    return {(camera, class): detections} plus the detector name."""
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()

    broker = MiniBroker()
    mask = str(tmp_path / 'mask_{}.png'.format(fleet))
    _write_mask(mask)
    config = ('http:\n  port: {}\nmqtt:\n  host: 127.0.0.1\n  port: {}\n'
              'model: ssd_tiny_test\ncameras:'.format(port, broker.port)
              + ''.join(CAMERA.format(i=i, w=W, h=H, mask=mask)
                        for i in range(N_CAMS)))
    config_file = tmp_path / 'config_{}.yaml'.format(fleet)
    config_file.write_text(config)

    env = {'WATSOR_FLEET': '1' if fleet else '0',
           'WATSOR_DEVICE_RENDER': '1',
           'TRT_FLOAT_PRECISION': '32'}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    app = Application(_parse_commandline_arguments(['-c', str(config_file)]))
    thread = threading.Thread(target=app.run, daemon=True)
    try:
        thread.start()
        url = 'http://127.0.0.1:{}'.format(port)

        # cameras up and detector consuming
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                metrics = json.loads(urllib.request.urlopen(
                    url + '/metrics', timeout=2).read())
                if len(metrics['cameras']) == N_CAMS and \
                        metrics['detectors'][0]['fps'] > 0:
                    break
            except Exception:
                pass
            time.sleep(1.0)
        else:
            pytest.fail('application never reached steady state '
                        '(fleet={})'.format(fleet))
        detector_name = metrics['detectors'][0]['name']

        # turn on detail publishing everywhere (operator command)
        for i in range(N_CAMS):
            topic = 'watsor/cameras/cam{:02d}/command'.format(i)
            assert broker.wait_subscribed(topic, timeout=60)
            broker.publish(topic, 'details = on')

        # steady-state detail payloads per (camera, class): keep the LAST
        # payload seen (the tracker's first reports can still be
        # history-merging while its window fills)
        details = {}
        deadline = time.time() + 240
        while time.time() < deadline:
            with broker.received:
                records = list(broker.records)
            for topic, payload, _ in records:
                if topic.endswith('/details'):
                    parts = topic.split('/')
                    details[(parts[2], parts[4])] = _details_key(payload)
            if len({cam for cam, _ in details}) >= N_CAMS:
                break
            time.sleep(1.0)
        cameras = {cam for cam, _ in details}
        assert len(cameras) >= N_CAMS * 3 // 4, (
            'details flowed for only {} of {} cameras (fleet={})'
            .format(len(cameras), N_CAMS, fleet))
        by_camera = {}
        for (cam, cls), value in details.items():
            by_camera.setdefault(cam, {})[cls] = value
        return by_camera, detector_name
    finally:
        app._stop_main.set()
        thread.join(60)
        broker.close()
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else \
                os.environ.__setitem__(k, v)


@pytest.fixture(scope='module', autouse=True)
def tiny_model_registered():
    zoo.MODEL_REGISTRY['ssd_tiny_test'] = (build_detector, TINY)
    yield
    zoo.MODEL_REGISTRY.pop('ssd_tiny_test', None)


def test_fleet_app_equals_single_device(tmp_path):
    fleet_details, fleet_name = _run_app(tmp_path, fleet=True)
    single_details, single_name = _run_app(tmp_path, fleet=False)

    # the fleet run really took the SPMD path
    assert 'MESH' in fleet_name, fleet_name
    assert 'MESH' not in single_name, single_name

    # detection-for-detection equality at the operator surface, every
    # camera that reported in both runs (>= 3/4 of them each)
    common = sorted(set(fleet_details) & set(single_details))
    assert len(common) >= N_CAMS // 2, (
        'too few cameras to compare: {}'.format(common))
    mismatches = {
        key: (fleet_details[key], single_details[key])
        for key in common if fleet_details[key] != single_details[key]}
    assert not mismatches, (
        'fleet and single-device detections diverge on {} of {} cameras; '
        'first: {}'.format(len(mismatches), len(common),
                           next(iter(sorted(mismatches.items())))))
