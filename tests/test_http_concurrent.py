"""Concurrent HTTP viewers: N simultaneous MJPEG clients (+ one MPEG-TS
client) on one camera — encode-once-per-epoch via the shared JPEG cache,
no ring starvation, and clean unsubscribe+deplete under viewer churn.

Reference contract: the per-camera JPEG cache exists precisely so multiple
viewers cost one encode per frame (/root/reference/watsor/output/
video.py:120-132), and a closing stream depletes its queue so ring slots
return (video.py:60-77)."""

import json
import threading
import time
import urllib.request

import pytest

from watsor_tpu.io import native
from watsor_tpu.main import Application, _parse_commandline_arguments
from watsor_tpu.output.http_stream import _JpegCache, default_jpeg_encode
from watsor_tpu.testing.shapes import ShapeDetectorBackend

CONFIG = """
http:
  port: {port}
cameras:
  - cam_a:
      width: 160
      height: 120
      input: synthetic://shapes
      detect:
        - person: {{confidence: 10, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
        encoder: [-f, rawvideo, -pix_fmt, rgb24, -i, -f, mpegts]
"""

JPEG_SOI = b'\xff\xd8'


def counting_cache():
    """The PRODUCTION cache set with only the default variant's encode
    function instrumented — every cache miss (and nothing else) increments
    the counter."""
    from watsor_tpu.output.http_stream import JpegCacheSet

    counter = {'encodes': 0}

    def counting_encode(image):
        counter['encodes'] += 1       # called under the cache lock
        return default_jpeg_encode(image)

    cache_set = JpegCacheSet()
    cache_set._caches[(None, 80)] = _JpegCache(counting_encode)
    return cache_set, counter


@pytest.fixture(scope='module')
def app_rig(tmp_path_factory):
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
    url = 'http://127.0.0.1:{}'.format(port)
    deadline = time.time() + 20
    while time.time() < deadline:
        try:
            metrics = json.loads(urllib.request.urlopen(
                url + '/metrics', timeout=1).read())
            if metrics['cameras'] and \
                    metrics['cameras'][0]['fps']['decoder'] > 0:
                break
        except Exception:
            pass
        time.sleep(0.2)
    else:
        pytest.fail('application did not come up')
    yield url, app
    app._stop_main.set()
    thread.join(20)


def _read_mjpeg_parts(url, min_parts, deadline, out, barrier=None,
                      hashes=None):
    """Read multipart frames until ``min_parts`` JPEG-bearing parts; record
    a hash of each complete JPEG when ``hashes`` (a set) is given."""
    import hashlib

    if barrier is not None:
        barrier.wait(timeout=10)
    request = urllib.request.urlopen(url, timeout=15)
    parts = 0
    try:
        buffer = b''
        while parts < min_parts and time.time() < deadline:
            chunk = request.read(4096)
            if not chunk:
                break
            buffer += chunk
            while True:
                start = buffer.find(JPEG_SOI)
                if start < 0:
                    buffer = buffer[-2:]
                    break
                end = buffer.find(b'\xff\xd9', start + 2)
                if end < 0:
                    buffer = buffer[start:]
                    break
                parts += 1
                if hashes is not None:
                    hashes.add(hashlib.sha1(
                        buffer[start:end + 2]).hexdigest())
                buffer = buffer[end + 2:]
    finally:
        request.close()
        out.append(parts)


def test_n_viewers_one_encode_per_epoch(app_rig):
    url, app = app_rig
    cache, counter = counting_cache()
    app._jpeg_caches['cam_a'] = cache    # the production cache, observed

    n_viewers, min_parts = 4, 5
    barrier = threading.Barrier(n_viewers)
    deadline = time.time() + 40
    results, hashes = [], set()
    threads = [threading.Thread(
        target=_read_mjpeg_parts,
        args=(url + '/video/mjpeg/cam_a', min_parts, deadline, results,
              barrier, hashes), daemon=True) for _ in range(n_viewers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)

    assert len(results) == n_viewers
    assert all(p >= 3 for p in results), (
        'a concurrent viewer starved: parts per viewer {}'.format(results))
    total_parts = sum(results)
    encodes = counter['encodes']
    # one encode per frame epoch: each encode produces one distinct JPEG
    # (the synthetic shapes move every frame), every delivered part is a
    # copy of some encode, and with 4 overlapping viewers the part count
    # must exceed the encode count — cache hits did the rest
    assert encodes >= 1
    assert len(hashes) <= encodes, (len(hashes), encodes)
    assert encodes < total_parts, (
        'no cache sharing: {} encodes for {} delivered parts'
        .format(encodes, total_parts))


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_mixed_mjpeg_and_mpegts_viewers(app_rig):
    url, app = app_rig
    deadline = time.time() + 40
    results = []
    mjpeg_threads = [threading.Thread(
        target=_read_mjpeg_parts,
        args=(url + '/video/mjpeg/cam_a', 3, deadline, results),
        daemon=True) for _ in range(2)]
    for t in mjpeg_threads:
        t.start()
    request = urllib.request.urlopen(url + '/video/mpegts/cam_a', timeout=15)
    ts = request.read(188 * 8)
    request.close()
    for t in mjpeg_threads:
        t.join(60)
    assert len(ts) >= 188 and ts[0] == 0x47, 'MPEG-TS stream broken'
    assert all(p >= 3 for p in results), results


def test_viewer_churn_releases_slots_and_subscriptions(app_rig):
    """Open/close viewers repeatedly (some abandoned mid-frame): the
    publisher must end with its original subscriber set and the out ring
    must keep cycling (no leaked non-READY slots)."""
    url, app = app_rig
    camera = app._camera_by_name('cam_a')
    # earlier tests' viewers may still be draining out — take the baseline
    # only once the registry has been stable for a moment
    stable_since, baseline_subs = time.time(), -1
    deadline = time.time() + 20
    while time.time() < deadline:
        count = camera.visual_effects.subscriber_count
        if count != baseline_subs:
            baseline_subs, stable_since = count, time.time()
        elif time.time() - stable_since > 3.0:
            break
        time.sleep(0.3)

    for i in range(8):
        deadline = time.time() + 15
        results = []
        _read_mjpeg_parts(url + '/video/mjpeg/cam_a', 1 + (i % 3),
                          deadline, results)
        assert results[0] >= 1

    # unsubscribe happens when the serving thread notices the disconnect
    # (its next write fails) — give each straggler a few seconds, then the
    # registry must be back to its original set, no phantom subscribers
    deadline = time.time() + 15
    while time.time() < deadline and \
            camera.visual_effects.subscriber_count != baseline_subs:
        time.sleep(0.3)
    assert camera.visual_effects.subscriber_count == baseline_subs

    # the out ring keeps making progress after churn (no slot leak): the
    # effects stage can only advance if slots return to READY
    metrics = json.loads(urllib.request.urlopen(
        url + '/metrics', timeout=10).read())
    cam = {c['name']: c for c in metrics['cameras']}['cam_a']
    assert cam['fps']['visual_effects'] > 0
    deadline = time.time() + 20
    while time.time() < deadline:
        metrics = json.loads(urllib.request.urlopen(
            url + '/metrics', timeout=10).read())
        cam = {c['name']: c for c in metrics['cameras']}['cam_a']
        if cam['buffer_out'] < 90:
            break
        time.sleep(0.5)
    assert cam['buffer_out'] < 90, (
        'out ring starving after viewer churn: {}% full'
        .format(cam['buffer_out']))


def test_jpeg_cache_set_evicts_lru_variants():
    """The per-camera variant map is bounded: exceeding max_variants
    evicts the least-recently-used cache and closes its encoder; a
    re-request of an evicted variant rebuilds it (a client sweeping
    ?quality values must not pin unbounded native contexts)."""
    from watsor_tpu.output.http_stream import JpegCacheSet

    cache_set = JpegCacheSet(max_variants=3)
    first = cache_set.get_cache(None, 80)
    for q in (81, 82):
        cache_set.get_cache(None, q)
    assert len(cache_set._caches) == 3
    cache_set.get_cache(None, 80)           # refresh LRU position of 80
    cache_set.get_cache(None, 83)           # evicts 81, not 80
    assert len(cache_set._caches) == 3
    assert (None, 81) not in cache_set._caches
    assert cache_set.get_cache(None, 80) is first
    # evicted variant rebuilds cleanly
    rebuilt = cache_set.get_cache((64, 64), 81)
    assert rebuilt is not cache_set.get_cache(None, 80)
    # encoding still works on a cache whose encoder was closed by
    # eviction (it rebuilds its native context lazily)
    import numpy as np
    evicted = cache_set.get_cache(None, 90)  # evict another
    image = np.zeros((32, 48, 3), np.uint8)

    class FakeFrame:
        epoch = 1
        image = None
    FakeFrame.image = image
    data = evicted.get(FakeFrame())
    assert data[:2] == b'\xff\xd8'
