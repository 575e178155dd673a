"""BASELINE config #5 as ONE measured experiment (VERDICT #1).

Boots the REAL Application — no injected backends — with 32 synthetic
1080p cameras (pre-rendered cycling sources: this rig has one host core
and no decode hardware, so camera decode is a memcpy stand-in), a zone
mask on every camera, the fused device filter cascade, device box
rendering, and one MPEG-TS broadcast encoder; the detector batches all 32
cameras into single TPU steps.

Samples /metrics for DURATION seconds after the first real inference and
writes the aggregate numbers to BASELINE5_OUT (default
/tmp/baseline5.json): per-stage FPS sums, detector fps and frame->
detection latency p50/p95, buffer fullness.

Environment caveats recorded in the output: the chip sits behind a
~23-55 MB/s tunnel (H2D of each 8.6 MB uint8 batch costs ~150-400 ms —
on a PCIe host it is <1 ms and overlaps compute) and the single host core
bounds synthetic frame generation; the device step itself sustains
3,522 fps at 1080p x batch 16 (BENCHMARKS.md).

Run: cd /root/repo && python -u scripts/run_baseline5.py
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CAMERAS = int(os.environ.get('BASELINE5_CAMERAS', 32))
DURATION = float(os.environ.get('BASELINE5_DURATION', 90))
WARM_DEADLINE = float(os.environ.get('BASELINE5_WARM_DEADLINE', 900))
PORT = int(os.environ.get('BASELINE5_PORT', 18580))
OUT = os.environ.get('BASELINE5_OUT', '/tmp/baseline5.json')


def make_mask(path, w=1920, h=1080):
    import cv2
    import numpy as np
    rgba = np.zeros((h, w, 4), np.uint8)
    cv2.fillPoly(rgba, [np.array([[200, 400], [900, 400],
                                  [1100, 1060], [100, 1060]])],
                 (90, 140, 90, 255))
    cv2.fillPoly(rgba, [np.array([[1300, 500], [1860, 500],
                                  [1860, 1060], [1300, 1060]])],
                 (140, 90, 90, 255))
    cv2.imwrite(path, rgba)


def make_config(path, mask_path):
    cameras = []
    for i in range(N_CAMERAS):
        enc = ''
        if i == 0:
            enc = ('      ffmpeg:\n'
                   '        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]\n'
                   '        encoder: [-f, rawvideo, -pix_fmt, rgb24, -i,'
                   ' -f, mpegts, -vcodec, libx264]\n')
        else:
            enc = ('      ffmpeg:\n'
                   '        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]\n')
        cameras.append(
            '  - cam{i:02d}:\n'
            '      width: 1920\n'
            '      height: 1080\n'
            '      input: synthetic://loop\n'
            '      mask: {mask}\n'
            '{enc}'
            '      detect:\n'
            '        - person: {{confidence: 10, area: 1}}\n'
            '        - car: {{confidence: 10, area: 1, zones: [1, 2]}}\n'
            .format(i=i, mask=mask_path, enc=enc))
    with open(path, 'w') as f:
        f.write('http:\n  port: {}\ncameras:\n{}'.format(
            PORT, ''.join(cameras)))


def get_metrics():
    url = 'http://127.0.0.1:{}/metrics'.format(PORT)
    with urllib.request.urlopen(url, timeout=10) as response:
        return json.loads(response.read())


def aggregate(metrics):
    # reference metrics shape: cameras is a LIST of {name, fps: {stage:
    # value}, ...} (main.py _metrics; shape re-pinned round 4)
    cams = metrics['cameras']
    agg = {
        'decoder_fps_total': round(sum(
            c['fps']['decoder'] for c in cams), 1),
        'sieve_fps_total': round(sum(
            c['fps']['sieve'] for c in cams), 1),
        'snapshot_fps_total': round(sum(
            c['fps']['snapshot'] for c in cams), 1),
        'encoder_fps': next((c['fps']['encoder'] for c in cams
                             if 'encoder' in c['fps']), None),
        'buffer_in_mean_pct': round(sum(
            c['buffer_in'] for c in cams) / len(cams), 1),
        'detectors': metrics['detectors'],
        'e2e_latency_ms_p50': max(
            (c.get('latency_ms_p50') or 0) for c in cams),
    }
    return agg


def main():
    os.environ.setdefault('WATSOR_DEVICE_RENDER', '1')
    mask_path = '/tmp/baseline5_mask.png'
    config_path = '/tmp/baseline5_config.yaml'
    make_mask(mask_path)
    make_config(config_path, mask_path)

    from watsor_tpu.main import Application, _parse_commandline_arguments
    args = _parse_commandline_arguments(
        ['-c', config_path, '-m', '/tmp/baseline5_no_weights'])
    app = Application(args)
    thread = threading.Thread(target=app.run, daemon=True)
    thread.start()

    def pace(fps):
        # pace via the synthetic decoder's own frame period: the MQTT
        # rate limiter would be lifted by the sieve's suspicious-activity
        # hook on every (random-weight) detection
        for camera in app._cameras:
            if hasattr(camera.decoder, '_period'):
                camera.decoder._period = (1.0 / fps) if fps > 0 else 0.0

    # throttle every camera to ~1 fps while XLA compiles: on a one-core
    # host 32 unthrottled 1080p sources starve the compile thread
    for _ in range(600):
        if app._cameras:
            pace(1)
            break
        time.sleep(1)
    print('cameras paced for warmup', file=sys.stderr, flush=True)

    print('waiting for the first real inference (compile over the '
          'tunnel)...', file=sys.stderr, flush=True)
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

    # measurement rate: BASELINE5_CAP fps/camera, or full speed. On a
    # one-core host full-speed decode (32 x 1080p memcpy ~3.3 GB/s)
    # starves the detector dispatch thread and the sieve — the cap finds
    # the host's balanced operating point; a real deployment has decode
    # hardware/cores and no cap.
    cap = float(os.environ.get('BASELINE5_CAP', 0) or 0)
    pace(cap if cap > 0 else 30)
    print('warm; sampling for {}s (cap={} fps/cam)'.format(DURATION, cap),
          file=sys.stderr, flush=True)
    samples = []
    t_end = time.time() + DURATION
    while time.time() < t_end:
        time.sleep(10)
        try:
            samples.append(aggregate(get_metrics()))
            s = samples[-1]
            print('decode {} fps | detect {} fps | sieve {} | p50 {} ms'
                  .format(s['decoder_fps_total'],
                          s['detectors'][0]['fps'],
                          s['sieve_fps_total'],
                          s['detectors'][0].get('latency_ms_p50')),
                  file=sys.stderr, flush=True)
        except Exception as exc:
            print('sample failed: {}'.format(exc), file=sys.stderr)

    app._stop_main.set()
    thread.join(30)
    if not samples:
        return 1
    # steady state = last half of the samples
    steady = samples[len(samples) // 2:]

    def mean(key, sub=None):
        vals = []
        for s in steady:
            v = s[key] if sub is None else s[key][0][sub]
            if v is not None:
                vals.append(v)
        return round(sum(vals) / len(vals), 1) if vals else None

    result = {
        'experiment': 'BASELINE config #5: {} x 1080p full pipeline, one '
                      'chip, real Application'.format(N_CAMERAS),
        'cameras': N_CAMERAS,
        'decoder_fps_total': mean('decoder_fps_total'),
        'sieve_fps_total': mean('sieve_fps_total'),
        'snapshot_fps_total': mean('snapshot_fps_total'),
        'encoder_fps': mean('encoder_fps'),
        'detector_fps': mean('detectors', 'fps'),
        'detector_inference_ms': mean('detectors', 'inference_time'),
        'latency_ms_p50': mean('detectors', 'latency_ms_p50'),
        'latency_ms_p95': mean('detectors', 'latency_ms_p95'),
        'buffer_in_mean_pct': mean('buffer_in_mean_pct'),
        'cap_fps_per_camera': cap or None,
        'samples': samples,
        'environment': {
            'host_cores': os.cpu_count(),
            'note': 'chip behind a ~23-55 MB/s tunnel; synthetic '
                    'pre-rendered camera sources (no decode cores on '
                    'this rig)',
        },
    }
    with open(OUT, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ('samples',)}, indent=2), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
