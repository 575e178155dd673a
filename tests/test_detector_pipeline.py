"""The detector's async pipeline (dispatch/resolve + ping-pong staging):
batch N+1 must be dispatched BEFORE batch N's results are resolved, every
frame must get its latch confirmation exactly once, and a dispatch/resolve
failure must not strand frames (they hold PUBLISH confirmations)."""

import threading
import time
from queue import Queue

import numpy as np

from watsor_tpu.detection.detector import ObjectDetector
from watsor_tpu.runtime.frames import FrameBuffer, State
from watsor_tpu.runtime.tasks import Payload


class AsyncSpyBackend:
    """Records the dispatch/resolve interleaving."""

    device_name = 'SPY'
    input_hw = (48, 64)

    def __init__(self, fail_on=None):
        self.events = []
        self.lock = threading.Lock()
        self.fail_on = fail_on or set()
        self._seq = 0

    def warmup(self, hw=None, batch=1):
        pass

    def dispatch(self, images_u8, senders=None):
        with self.lock:
            self._seq += 1
            seq = self._seq
            self.events.append(('dispatch', seq))
        if seq in self.fail_on:
            raise RuntimeError('injected dispatch failure')
        return (seq, images_u8.shape[0])

    def resolve(self, handle):
        seq, n = handle
        with self.lock:
            self.events.append(('resolve', seq))
        if ('resolve', seq) in self.fail_on:
            raise RuntimeError('injected resolve failure')
        boxes = np.zeros((n, 100, 4), np.float32)
        scores = np.zeros((n, 100), np.float32)
        classes = np.zeros((n, 100), np.int32)
        valid = np.zeros((n,), np.int32)
        return boxes, scores, classes, valid, 1.0

    def detect_batch(self, images_u8, senders=None):
        return self.resolve(self.dispatch(images_u8, senders=senders))


def _push(buffer, queue, index):
    frame = buffer.frames[index]
    frame.clear()
    frame.stamp()
    frame.latch.next()      # READY -> DETECT, arm 1 confirmation
    queue.put(Payload('cam', index))
    return frame


def _wait_ready(frames, timeout=10):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if all(f.latch.state != State.DETECT for f in frames):
            return True
        time.sleep(0.01)
    return False


def test_pipeline_overlaps_and_confirms_all_frames():
    buffer = FrameBuffer(8, 48, 64)
    queue = Queue()
    backend = AsyncSpyBackend()
    detector = ObjectDetector('det', queue, {'cam': buffer}, backend,
                              max_batch=1, batch_window_ms=0.0)
    detector.start()
    try:
        frames = [_push(buffer, queue, i) for i in range(6)]
        assert _wait_ready(frames), 'frames stranded in DETECT'
    finally:
        detector.terminate()
        detector.join(5)

    # overlap: some dispatch(k+1) must appear before resolve(k)
    events = backend.events
    order = {e: i for i, e in enumerate(events)}
    overlapped = any(
        ('dispatch', k + 1) in order and ('resolve', k) in order and
        order[('dispatch', k + 1)] < order[('resolve', k)]
        for k in range(1, 6))
    assert overlapped, events
    # every dispatched batch resolved exactly once
    dispatched = [s for kind, s in events if kind == 'dispatch']
    resolved = [s for kind, s in events if kind == 'resolve']
    assert sorted(dispatched) == sorted(resolved), events


def test_dispatch_failure_confirms_frames():
    buffer = FrameBuffer(4, 48, 64)
    queue = Queue()
    backend = AsyncSpyBackend(fail_on={2})
    detector = ObjectDetector('det', queue, {'cam': buffer}, backend,
                              max_batch=1, batch_window_ms=0.0)
    detector.start()
    try:
        frames = [_push(buffer, queue, i) for i in range(4)]
        assert _wait_ready(frames), \
            'a failed dispatch stranded its frames in DETECT'
    finally:
        detector.terminate()
        detector.join(5)


def test_resolve_failure_confirms_frames():
    buffer = FrameBuffer(4, 48, 64)
    queue = Queue()
    backend = AsyncSpyBackend(fail_on={('resolve', 1)})
    detector = ObjectDetector('det', queue, {'cam': buffer}, backend,
                              max_batch=1, batch_window_ms=0.0)
    detector.start()
    try:
        frames = [_push(buffer, queue, i) for i in range(4)]
        assert _wait_ready(frames), \
            'a failed resolve stranded its frames in DETECT'
    finally:
        detector.terminate()
        detector.join(5)


def test_stop_flushes_inflight():
    buffer = FrameBuffer(4, 48, 64)
    queue = Queue()
    backend = AsyncSpyBackend()
    detector = ObjectDetector('det', queue, {'cam': buffer}, backend,
                              max_batch=1, batch_window_ms=0.0)
    detector.start()
    try:
        frame = _push(buffer, queue, 0)
        deadline = time.time() + 5
        while not backend.events and time.time() < deadline:
            time.sleep(0.01)
    finally:
        detector.terminate()
        detector.join(5)
    assert frame.latch.state != State.DETECT, \
        'terminate stranded the in-flight batch'
