"""Video pipeline integration: a real encoded clip flows through the
native decoder task into the ring (with the detect-resolution plane filled
in the same pass), through the batched detector, out to a counting
subscriber — and the decoder ends gracefully at EOF so the watchdog could
reconnect it (the reference's ffmpeg lifecycle contract,
/root/reference/watsor/stream/ffmpeg.py:70-76)."""

import threading
import time
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.io import native
from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer
from watsor_tpu.detection.detector import ObjectDetector
from watsor_tpu.testing.shapes import (SHAPE_LABELS, ShapeCounter,
                                       ShapeDetectorBackend)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native video runtime unavailable')

W, H = 160, 120
DETECT_HW = (60, 80)


@pytest.fixture
def clip(tmp_path):
    """A 40-frame clip with a moving black rectangle."""
    path = str(tmp_path / 'clip.mp4')
    with native.Encoder(path, W, H, fps=25.0) as enc:
        for i in range(60):
            img = np.full((H, W, 3), 255, np.uint8)
            x = 10 + i
            img[30:90, x:x + 50] = 0
            enc.write(img)
    return path


def test_decode_detect_count(clip):
    from watsor_tpu.io.video import VideoDecoder

    stop = threading.Event()
    buffer = FrameBuffer(10, W, H, detect_hw=DETECT_HW)
    queues = balanced_queue_group(['cam'], maxsize=2)

    # realtime pacing: a depth-1 subscriber queue misses most frames of an
    # unpaced decode burst (latest-frame-wins), so play at native 25 fps
    decoder = VideoDecoder('cam', queues['cam'], buffer, clip,
                           stop_event=stop, realtime=True)
    detector = ObjectDetector('det', queues['cam'], {'cam': buffer},
                              ShapeDetectorBackend(DETECT_HW),
                              stop_event=stop, max_batch=4)
    counter_queue = Queue(1)
    counter = ShapeCounter('counter', counter_queue, buffer, count=10,
                           stop_event=stop)
    decoder.subscribe(counter_queue)

    for task in (counter, detector, decoder):
        task.start()
    try:
        assert counter.latch.wait(20), 'did not see 10 detected frames'
        assert SHAPE_LABELS['rectangle'] in counter.seen_labels
        # EOF: decoder spin ends but is NOT shut down (watchdog would
        # restart it for the reconnect loop)
        deadline = time.time() + 10
        while decoder.is_alive() and time.time() < deadline:
            time.sleep(0.1)
        assert not decoder.is_alive()
        assert not decoder.is_shutdown()
    finally:
        stop.set()
        for task in (decoder, detector, counter):
            task.join(5)


def test_decoder_restart_after_eof(clip):
    """initialize() + start() after EOF re-opens the source (the watchdog
    restart path)."""
    from watsor_tpu.io.video import VideoDecoder

    stop = threading.Event()
    buffer = FrameBuffer(10, W, H, detect_hw=DETECT_HW)
    queues = balanced_queue_group(['cam'], maxsize=2)
    decoder = VideoDecoder('cam', queues['cam'], buffer, clip,
                           stop_event=stop, realtime=False)

    sink = Queue(4)
    decoder.subscribe(sink)

    def drain():
        from queue import Empty
        while not stop.is_set():
            try:
                payload = sink.get(timeout=0.2)
            except Empty:
                continue
            frame = buffer.frames[payload.frame_index]
            frame.latch.next()   # detector confirmation
            frame.latch.next()   # subscriber confirmation

    drainer = threading.Thread(target=drain, daemon=True)
    drainer.start()

    # consume queue payloads too (no detector attached)
    from queue import Empty

    def drain_batch_queue():
        while not stop.is_set():
            try:
                queues['cam'].get(timeout=0.2)
            except Empty:
                continue

    threading.Thread(target=drain_batch_queue, daemon=True).start()

    decoder.start()
    deadline = time.time() + 15
    while decoder.is_alive() and time.time() < deadline:
        time.sleep(0.1)
    assert not decoder.is_alive(), 'decoder did not reach EOF'
    first_count = decoder.fps

    decoder.initialize()
    decoder.start()
    time.sleep(1.0)
    assert decoder.is_alive() or not decoder.is_shutdown()
    stop.set()
    decoder.join(5)
