"""Latency vs camera count ON SILICON (round-4 VERDICT #1).

The north-star claim (<50 ms frame->detection p50, BASELINE.md target 2;
reference latency stance /root/reference/README.md:7,124) has only ever
been supported by arithmetic over device-step numbers. This script measures
it: the REAL Application (no injected backends) at SWEEP_CAMERAS synthetic
cameras of SWEEP_WIDTHxSWEEP_HEIGHT, the production bf16 zoo model, device
filter cascade on, sampling /metrics for the detector's frame->detection
latency percentiles and the sieve's end-to-end analysis percentiles.

One process = ONE compiled program: WATSOR_MIN_BUCKET pins every live
batch to bucket(cameras), so the run pays exactly one tunnel compile.

After the pipeline stops, the same process probes the two tunnel
components that dominate this rig but vanish on a PCIe host:
  - round-trip time: device_put(4 B) + scalar fetch, median of 20
  - H2D bandwidth: device_put of one staging batch (bucket x 300^2 x 3)
so the residual pipeline latency (host staging + step + scatter) can be
stated from measured parts.

Appends ONE json line per run to SWEEP_OUT (default LATENCY_SWEEP.jsonl).

Run (one leg):
  cd /root/repo && SWEEP_CAMERAS=4 timeout 900 python -u scripts/latency_sweep.py
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CAMERAS = int(os.environ.get('SWEEP_CAMERAS', 4))
WIDTH = int(os.environ.get('SWEEP_WIDTH', 1920))
HEIGHT = int(os.environ.get('SWEEP_HEIGHT', 1080))
MODEL = os.environ.get('SWEEP_MODEL', 'ssd_mobilenet_v2')
CAP = float(os.environ.get('SWEEP_CAP', 10))
DURATION = float(os.environ.get('SWEEP_DURATION', 60))
WARM_DEADLINE = float(os.environ.get('SWEEP_WARM_DEADLINE', 900))
PORT = int(os.environ.get('SWEEP_PORT', 18581))
OUT = os.environ.get('SWEEP_OUT', 'LATENCY_SWEEP.jsonl')


def make_config(path):
    cameras = []
    for i in range(N_CAMERAS):
        cameras.append(
            '  - cam{i:02d}:\n'
            '      width: {w}\n'
            '      height: {h}\n'
            '      input: synthetic://loop\n'
            '      ffmpeg:\n'
            '        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]\n'
            '      detect:\n'
            '        - person: {{confidence: 10, area: 1}}\n'
            '        - car: {{confidence: 10, area: 1}}\n'
            .format(i=i, w=WIDTH, h=HEIGHT))
    with open(path, 'w') as f:
        f.write('http:\n  port: {}\ncameras:\n{}'.format(
            PORT, ''.join(cameras)))


def get_metrics():
    url = 'http://127.0.0.1:{}/metrics'.format(PORT)
    with urllib.request.urlopen(url, timeout=10) as response:
        return json.loads(response.read())


def sample(metrics):
    # reference metrics shape: cameras is a LIST of {name, fps: {stage:
    # value}, latency_ms: {sieve: {p50, p95}}, ...} (main.py _metrics)
    cams = metrics['cameras']
    det = metrics['detectors'][0]
    return {
        'decoder_fps_total': round(sum(
            c['fps']['decoder'] for c in cams), 1),
        'sieve_fps_total': round(sum(
            c['fps']['sieve'] for c in cams), 1),
        'detector_fps': det['fps'],
        'inference_ms': det.get('inference_time'),
        'detector_p50': det.get('latency_ms_p50'),
        'detector_p95': det.get('latency_ms_p95'),
        'sieve_p50': max((c.get('latency_ms_p50') or 0) for c in cams),
        'sieve_p95': max((c['latency_ms']['sieve'].get('p95') or 0)
                         for c in cams),
    }


def probe_tunnel_components(bucket):
    """Measured RTT + H2D bandwidth of this process's device link."""
    import jax
    import numpy as np
    dev = jax.devices()[0]
    tiny = np.zeros((1,), np.float32)
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        x = jax.device_put(tiny, dev)
        float(x[0])
        rtts.append((time.perf_counter() - t0) * 1000.0)
    rtts.sort()
    payload = np.random.RandomState(0).randint(
        0, 255, (bucket, 300, 300, 3), np.uint8)
    bws = []
    for i in range(5):
        payload[0, 0, 0, 0] = i        # defeat replay caching
        t0 = time.perf_counter()
        x = jax.device_put(payload, dev)
        x.block_until_ready()
        # force the bytes to have actually landed: fetch one element
        int(x[0, 0, 0, 0])
        bws.append(payload.nbytes / (time.perf_counter() - t0) / 1e6)
    return {
        'rtt_ms_median': round(rtts[len(rtts) // 2], 1),
        'h2d_mb_s_best': round(max(bws), 1),
        'h2d_payload_mb': round(payload.nbytes / 1e6, 2),
    }


def main():
    from watsor_tpu.detection.backend import _bucket
    bucket = _bucket(N_CAMERAS)
    os.environ['WATSOR_MIN_BUCKET'] = str(bucket)

    config_path = '/tmp/sweep_config.yaml'
    make_config(config_path)

    from watsor_tpu.main import Application, _parse_commandline_arguments
    args = _parse_commandline_arguments(
        ['-c', config_path, '-m', '/tmp/sweep_no_weights', '--model', MODEL])
    app = Application(args)
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()

    def pace(fps):
        for camera in app._cameras:
            if hasattr(camera.decoder, '_period'):
                camera.decoder._period = (1.0 / fps) if fps > 0 else 0.0

    for _ in range(600):
        if app._cameras:
            pace(1)
            break
        time.sleep(1)

    print('waiting for first inference (one compile: bucket {})...'
          .format(bucket), file=sys.stderr, flush=True)
    deadline = time.time() + WARM_DEADLINE
    while time.time() < deadline:
        try:
            m = get_metrics()
            if m['detectors'] and m['detectors'][0]['fps'] > 0:
                break
        except Exception:
            pass
        time.sleep(5)
    else:
        print('FAIL: no inference within deadline', file=sys.stderr)
        app._stop_main.set()
        return 1

    pace(CAP)
    # let the latency windows refill with steady-state samples
    time.sleep(15)
    print('warm; sampling {}s at {} fps/cam x {} cams'.format(
        DURATION, CAP, N_CAMERAS), file=sys.stderr, flush=True)
    samples = []
    t_end = time.time() + DURATION
    while time.time() < t_end:
        time.sleep(10)
        try:
            samples.append(sample(get_metrics()))
            s = samples[-1]
            print('det p50 {} p95 {} | sieve p50 {} | det fps {}'.format(
                s['detector_p50'], s['detector_p95'], s['sieve_p50'],
                s['detector_fps']), file=sys.stderr, flush=True)
        except Exception as exc:
            print('sample failed: {}'.format(exc), file=sys.stderr)

    app._stop_main.set()
    thread.join(30)
    if not samples:
        return 1
    steady = samples[len(samples) // 2:]

    def mean(key):
        vals = [s[key] for s in steady if s[key] is not None]
        return round(sum(vals) / len(vals), 1) if vals else None

    import jax
    platform = jax.devices()[0].platform
    tunnel = None
    if platform != 'cpu':
        try:
            tunnel = probe_tunnel_components(bucket)
        except Exception as exc:
            tunnel = {'error': str(exc)}

    row = {
        'experiment': 'latency_sweep',
        'cameras': N_CAMERAS,
        'resolution': '{}x{}'.format(WIDTH, HEIGHT),
        'model': MODEL,
        'platform': platform,
        'bucket': bucket,
        'cap_fps_per_camera': CAP,
        'detector_latency_ms_p50': mean('detector_p50'),
        'detector_latency_ms_p95': mean('detector_p95'),
        'sieve_e2e_ms_p50': mean('sieve_p50'),
        'sieve_e2e_ms_p95': mean('sieve_p95'),
        'detector_fps': mean('detector_fps'),
        'inference_ms_per_frame': mean('inference_ms'),
        'decoder_fps_total': mean('decoder_fps_total'),
        'tunnel': tunnel,
        'host_cores': os.cpu_count(),
        'ts': time.strftime('%Y-%m-%dT%H:%M:%S'),
    }
    with open(OUT, 'a') as f:
        f.write(json.dumps(row) + '\n')
    print(json.dumps(row, indent=2), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
