"""Host-side budget table (round-4 VERDICT #4).

The chip-side numbers (BENCHMARKS.md roofline/full-pipeline tables) say the
device has ~3.7x headroom at 32x1080p — but the Python stages run on host
cores, and their per-frame cost decides cameras-per-host-core on real
(multi-core) deployment hardware. This script measures each host stage IN
ISOLATION with realistic 1080p inputs and 5 detections/frame:

  sieve_tracker        DetectionSieve with device filters on (tracker only)
  sieve_host_cascade   DetectionSieve with the full host filter cascade
                       (confidence+area+2-zone mask) — WATSOR_DEVICE_FILTERS=0
  detector_stage       staging memcpy of one 300^2 detect plane
  detector_scatter     ObjectDetector._scatter per frame (zones path)
  snapshot_steady      Snapshot._new_frame, steady state (no image copy)
  snapshot_copy        Snapshot._new_frame, adversarial sub-epsilon rising
                       confidence — bounded by SNAPSHOT_EPSILON (round-5
                       fix): copies only on a >epsilon improvement, so the
                       old per-frame 6.2 MB copy cannot recur (<=100
                       copies per 10 s TTL window even when forced)
  mqtt_states          MQTT._new_frame via real socket to the mini broker
  mqtt_details         same with per-detection details JSON enabled
  jpeg_1080p           JPEG encode of one 1080p frame (per VIEWED camera)

Writes HOST_BUDGET.json and prints a table plus the cameras-per-core model
at 30 fps/camera. Reference worked example being matched:
/root/reference/README.md:212 (CPU/core sizing guidance).

Run: cd /root/repo && timeout 900 python -u scripts/host_budget.py
"""

import json
import os
import sys
import time
from queue import Queue

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from watsor_tpu.runtime.frames import DETECTION_DTYPE, FrameBuffer

W, H = 1920, 1080
N_DET = 5
OUT = os.environ.get('HOST_BUDGET_OUT', 'HOST_BUDGET.json')


class _NoopLatch:
    state = None

    def next(self):
        pass


def _detections(rng, t=0):
    """5 plausible moving detections (person/car) in 1080p pixel space."""
    recs = np.zeros(N_DET, DETECTION_DTYPE)
    for i in range(N_DET):
        # inside the zone rows (y 400-1060) so the host mask cascade KEEPS
        # them — a fair tracker comparison needs survivors on both paths
        y0 = 450.0 + 37 * i + 3 * np.sin(t * 0.3 + i)
        x0 = 150.0 + 290 * i + 4 * np.cos(t * 0.25 + i)
        recs['label'][i] = 1 if i % 2 == 0 else 3     # person / car
        recs['confidence'][i] = 0.55 + 0.05 * i
        recs['bbox'][i] = (y0, x0, y0 + 260, x0 + 130)
    return recs


def _timeit(fn, reps, per=1):
    # warm
    for _ in range(min(5, reps)):
        fn(0)
    t0 = time.perf_counter()
    for t in range(reps):
        fn(t)
    return (time.perf_counter() - t0) / reps / per * 1000.0


def _mask_alpha():
    alpha = np.zeros((H, W), np.uint8)
    alpha[400:1060, 100:1100] = 255
    alpha[500:1060, 1300:1860] = 255
    return alpha


def bench_sieve(device_filters):
    from watsor_tpu.filters import (AreaFilter, ConfidenceFilter, MaskFilter,
                                    TrackFilter, ZoneMask)
    from watsor_tpu.filters.sieve import DetectionSieve

    # area 1%: a 260x130 px box is ~1.6% of 1080p — the default 10% would
    # silently drop every detection and measure an idle tracker
    detect = [{'person': {'confidence': 50, 'area': 1}},
              {'car': {'confidence': 50, 'area': 1, 'zones': [1, 2]}}]
    if device_filters:
        chain = []
    else:
        zone_mask = ZoneMask(_mask_alpha(), (H, W))
        chain = [ConfidenceFilter(detect), AreaFilter(detect),
                 MaskFilter(detect, zone_mask)]
    track = TrackFilter(chain)
    buf = FrameBuffer(2, W, H)
    frame = buf.frames[0]
    frame.latch = _NoopLatch()
    sieve = DetectionSieve('bench-sieve', Queue(), buf, track)
    rng = np.random.RandomState(0)

    def step(t):
        frame.stamp()
        frame.set_detections(_detections(rng, t))
        sieve._incoming_frame(frame)

    return _timeit(step, 400)


def bench_detector_stage():
    buf = FrameBuffer(2, W, H, detect_hw=(300, 300))
    frame = buf.frames[0]
    staging = np.zeros((16, 300, 300, 3), np.uint8)

    def step(t):
        staging[t % 16] = frame.detect_plane

    return _timeit(step, 2000)


def bench_detector_scatter():
    from watsor_tpu.detection.detector import ObjectDetector

    class _Backend:
        device_name = 'BENCH'
        input_hw = (300, 300)

        def warmup(self, hw=None, batch=1):
            pass

    batch = 16
    buf = FrameBuffer(batch + 1, W, H, detect_hw=(300, 300))
    frames = buf.frames[:batch]
    for f in frames:
        f.latch = _NoopLatch()
    det = ObjectDetector('bench-det', Queue(), {'cam': buf}, _Backend(),
                         max_batch=batch)
    rng = np.random.RandomState(0)
    boxes = rng.rand(batch, 100, 4).astype(np.float32)
    boxes[..., 2:] = np.minimum(boxes[..., :2] + 0.2, 1.0)
    scores = np.zeros((batch, 100), np.float32)
    classes = np.zeros((batch, 100), np.int32)
    scores[:, :N_DET] = 0.6
    classes[:, :N_DET] = 1
    valid = np.full(batch, N_DET, np.int32)
    zones_hit = np.zeros((batch, 100, 10), bool)
    zones_hit[:, :N_DET, 0] = True
    result = (boxes, scores, classes, valid, 8.0, zones_hit)

    def step(t):
        for f in frames:
            f.stamp()
        det._scatter(result, frames)

    # subtract the untimed prep? stamp() is ~ns; fold it in honestly
    return _timeit(step, 200, per=batch)


def bench_snapshot(worst_case):
    from watsor_tpu.output.snapshot import Snapshot

    buf = FrameBuffer(2, W, H)
    frame = buf.frames[0]
    frame.latch = _NoopLatch()
    snap = Snapshot('bench-snap', Queue(), buf, ['person', 'car'], [])
    rng = np.random.RandomState(0)

    def step(t):
        recs = _detections(rng, t)
        if worst_case:
            # strictly rising sub-epsilon confidence: before the round-5
            # SNAPSHOT_EPSILON guard this replaced the stored 6.2 MB frame
            # EVERY frame (0.70 ms); now it must cost ~the steady state
            recs['confidence'] += (t % 1000) * 1e-4
        else:
            recs['confidence'] = 0.3   # never beats the stored best
        frame.stamp()
        frame.set_detections(recs)
        snap._new_frame(frame, None)

    # seed the store so steady state starts stored
    step(0)
    return _timeit(step, 60 if worst_case else 400)


def bench_mqtt(details):
    from watsor_tpu.output.mqtt import MQTT
    from watsor_tpu.runtime.meters import FramesPerSecond, RateLimiter
    from watsor_tpu.testing.broker import MiniBroker

    class _FakeDecoder:
        rate_limiter = RateLimiter()
        fps = FramesPerSecond()

        class stop_event:
            @staticmethod
            def is_set():
                return False

        @staticmethod
        def is_shutdown():
            return False

    broker = MiniBroker()
    buf = FrameBuffer(2, W, H)
    frame = buf.frames[0]
    frame.latch = _NoopLatch()
    stage = MQTT('bench-mqtt', 'bench', Queue(), buf,
                 {'host': '127.0.0.1', 'port': broker.port},
                 ['person', 'car'], _FakeDecoder())
    stage._on_start()
    assert stage._client.connected
    stage._details_enabled = details
    rng = np.random.RandomState(0)

    def step(t):
        frame.stamp()
        frame.set_detections(_detections(rng, t))
        stage._new_frame(frame, None)

    ms = _timeit(step, 400)
    try:
        stage._client.disconnect()
    except Exception:
        pass
    broker.close()
    return ms


def bench_jpeg():
    from watsor_tpu.output.http_stream import default_jpeg_encode

    image = np.random.RandomState(0).randint(0, 255, (H, W, 3), np.uint8)

    def step(t):
        default_jpeg_encode(image)

    return _timeit(step, 30)


def _viewer_image():
    """A camera-like 1080p scene (gradient + blocks), not white noise —
    noise has no spatial redundancy and pays a pathological DCT/entropy
    cost no real camera ever does. The legacy jpeg_1080p row keeps the
    noise input for continuity with earlier rounds."""
    rng = np.random.RandomState(0)
    y = np.linspace(0, 255, H, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, W, dtype=np.float32)[None, :]
    img = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], axis=-1)
    for _ in range(12):                      # objects
        cy, cx = rng.randint(0, H - 160), rng.randint(0, W - 240)
        img[cy:cy + 160, cx:cx + 240] = rng.randint(0, 255, 3)
    img += rng.normal(0, 4, img.shape)       # sensor noise
    return np.clip(img, 0, 255).astype(np.uint8)


def bench_jpeg_scene_legacy(n=60):
    """Like-for-like A/B partner for the persistent rows: the PRE-round-5
    encode path (fresh codec+swscale contexts per frame, source resolution)
    on the SAME camera-like scene, so the persistent-context win isn't
    conflated with the noise-vs-scene content difference."""
    from watsor_tpu.output.http_stream import default_jpeg_encode

    image = _viewer_image()
    default_jpeg_encode(image)

    def step(t):
        default_jpeg_encode(image)

    return _timeit(step, n)


def bench_jpeg_viewer(out_hw=None, n=60):
    """Per-frame cost of one MJPEG viewer variant on the persistent
    native encoder (the production path after the round-5 viewer-path
    work: context reuse + downscale fused into the swscale pass)."""
    from watsor_tpu.output.http_stream import _scaled_encode

    image = _viewer_image()
    encode = _scaled_encode(out_hw, 80)
    encode(image)                             # open the context

    def step(t):
        encode(image)

    return _timeit(step, n)


def main():
    rows = {}
    rows['sieve_tracker'] = bench_sieve(device_filters=True)
    rows['sieve_host_cascade'] = bench_sieve(device_filters=False)
    rows['detector_stage'] = bench_detector_stage()
    rows['detector_scatter'] = bench_detector_scatter()
    rows['snapshot_steady'] = bench_snapshot(worst_case=False)
    rows['snapshot_copy'] = bench_snapshot(worst_case=True)
    rows['mqtt_states'] = bench_mqtt(details=False)
    rows['mqtt_details'] = bench_mqtt(details=True)
    rows['jpeg_1080p'] = bench_jpeg()
    rows['jpeg_1080p_scene_legacy'] = bench_jpeg_scene_legacy()
    rows['jpeg_1080p_persistent'] = bench_jpeg_viewer(None)
    rows['jpeg_scale2_960x540'] = bench_jpeg_viewer((540, 960))
    rows['jpeg_scale4_480x270'] = bench_jpeg_viewer((270, 480))
    rows['jpeg_detect_300x300'] = bench_jpeg_viewer((300, 300))

    # steady-state per-camera per-frame host cost on the serving path
    # (device filters on, MQTT states, snapshot no-copy; JPEG only for
    # viewed cameras, host cascade only with WATSOR_DEVICE_FILTERS=0)
    per_frame = (rows['sieve_tracker'] + rows['detector_stage'] +
                 rows['detector_scatter'] + rows['snapshot_steady'] +
                 rows['mqtt_states'])
    fps = 30.0
    cams_per_core = 1000.0 / (per_frame * fps)
    result = {
        'per_stage_ms_per_frame': {k: round(v, 4) for k, v in rows.items()},
        'steady_path_ms_per_frame': round(per_frame, 4),
        'cameras_per_core_at_30fps': round(cams_per_core, 1),
        'host': {'cores': os.cpu_count(),
                 'note': 'measured on the 1-core bench host; scale '
                         'linearly per core (stages are per-camera '
                         'threads, GIL-releasing numpy/socket work)'},
        'ts': time.strftime('%Y-%m-%dT%H:%M:%S'),
    }
    with open(OUT, 'w') as f:
        json.dump(result, f, indent=2)
    for k, v in rows.items():
        print('{:22s} {:8.3f} ms/frame'.format(k, v))
    print('steady path            {:8.3f} ms/frame -> {:.1f} cameras/core '
          'at 30 fps'.format(per_frame, cams_per_core))
    return 0


if __name__ == '__main__':
    sys.exit(main())
