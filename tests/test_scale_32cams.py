"""32-camera scale test: the full application graph — 32 synthetic
cameras, one shared balanced queue, ONE batched detector — runs with every
camera making progress and batches actually forming across cameras.

This is the north-star topology (BASELINE.json: 32 streams on one chip)
exercised structurally on the CPU: fairness comes from the per-camera
quota (reference BalancedQueue semantics,
/root/reference/watsor/stream/sync.py:144-166), batching from the
detector's gather window."""

import threading
import time
import urllib.request

import pytest

from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.testing.shapes import ShapeDetectorBackend

N_CAMS = 32

CAMERA = """
  - cam{i:02d}:
      width: 96
      height: 64
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


@pytest.fixture(scope='module')
def app32(tmp_path_factory):
    import socket
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    config = 'http:\n  port: {}\ncameras:'.format(port) + ''.join(
        CAMERA.format(i=i) for i in range(N_CAMS))
    config_file = tmp_path_factory.mktemp('cfg32') / 'config.yaml'
    config_file.write_text(config)
    app = Application(_parse_commandline_arguments(['-c', str(config_file)]),
                      backend_factory=lambda device:
                      ShapeDetectorBackend((64, 96)))
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()
    url = 'http://127.0.0.1:{}'.format(port)
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            urllib.request.urlopen(url + '/health', timeout=1)
            break
        except Exception:
            time.sleep(0.3)
    yield url, app
    app._stop_main.set()
    thread.join(30)


def test_all_32_cameras_progress(app32):
    url, app = app32
    import json
    # give the graph a few seconds of steady state on one core
    deadline = time.time() + 45
    while time.time() < deadline:
        with urllib.request.urlopen(url + '/metrics', timeout=10) as resp:
            metrics = json.load(resp)
        decoders = [c['fps']['decoder'] for c in metrics['cameras']]
        sieves = [c['fps']['sieve'] for c in metrics['cameras']]
        if len(decoders) == N_CAMS and min(decoders) > 0 and \
                min(sieves) > 0:
            break
        time.sleep(1.0)
    assert len(decoders) == N_CAMS
    assert min(decoders) > 0, 'a camera is starved at the decoder'
    assert min(sieves) > 0, 'a camera is starved at the sieve (fairness)'
    assert metrics['detectors'][0]['fps'] > 0


def test_batches_form_across_cameras(app32):
    url, app = app32
    detector = app._detectors[0]
    # the staging buffer tells us the max batch assembled so far only via
    # instrumentation; instead sample queue drain behavior: with 32 cameras
    # feeding one detector through a shared queue, the gather window must
    # produce multi-frame batches (fps_detector ~ fps_sieve_sum requires it
    # on one core). Check the detector keeps up with the aggregate rate.
    import json
    with urllib.request.urlopen(url + '/metrics', timeout=10) as resp:
        metrics = json.load(resp)
    sieve_sum = sum(c['fps']['sieve'] for c in metrics['cameras'])
    det_fps = metrics['detectors'][0]['fps']
    assert det_fps >= sieve_sum * 0.8, (det_fps, sieve_sum)


def test_latency_bound_under_full_scale(app32):
    """Automated guard for the north-star latency posture (<50 ms p50
    frame→detection on hardware, BASELINE.json): with the analytic backend
    the measured latency IS the pipeline-added latency (queue waits, batch
    gather window, latch protocol) — a CPU-CI bound fails the suite if the
    machinery starts adding delay. Runs after the progress test so the
    sliding window holds steady-state samples.

    Bounds pinned against the round-4 silicon measurement
    (BENCHMARKS.md "Latency vs camera count ON SILICON",
    LATENCY_SWEEP.jsonl / TRANSPORT_PROBE.jsonl): the machinery adds
    ~8.8 ms on the chip rig and 3-6 ms p50 on this CI rig at 32 cameras
    on one core, so 50 ms (the full north-star budget, >10x the measured
    CI value) guards the posture. The per-camera sieve check uses the
    median: on a loaded one-core suite run a single camera's window can
    catch a scheduler stall (worst observed 157 ms while the median held
    ~6 ms), so the worst-camera bound only rules out systemic delay."""
    url, app = app32
    import json
    import time
    # absolute wall-clock bound on a shared one-core CI host: a transient
    # scheduler stall can poison one 10 s sampling window, so re-sample
    # (up to twice, window-length apart) before declaring a real breach —
    # a systemic delay persists across windows, a stall does not
    for attempt in range(3):
        with urllib.request.urlopen(url + '/metrics', timeout=10) as resp:
            metrics = json.load(resp)
        det = metrics['detectors'][0]
        if 0 < det['latency_ms_p50'] < 50:
            break
        if attempt < 2:
            time.sleep(5)
    assert 0 < det['latency_ms_p50'] < 50, det
    # sieve e2e (capture -> filtered detections) across cameras
    p50s = sorted(c['latency_ms']['sieve']['p50']
                  for c in metrics['cameras'])
    assert all(p > 0 for p in p50s)
    assert p50s[len(p50s) // 2] < 100, (
        'median pipeline-added sieve latency {} ms'
        .format(p50s[len(p50s) // 2]))
    assert p50s[-1] < 400, (
        'pipeline-added sieve latency out of bounds: worst {} ms'
        .format(p50s[-1]))
