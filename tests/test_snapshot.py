"""Snapshot keeper: best-confidence retention, TTL expiry, JPEG output
(the reference's test_output.py snapshot contract)."""

import threading
import time
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.output import snapshot as snapshot_module
from watsor_tpu.output.snapshot import Snapshot
from watsor_tpu.runtime.frames import DETECTION_DTYPE, FrameBuffer, State
from watsor_tpu.runtime.tasks import Payload


def make_rig(classes=('person',)):
    stop = threading.Event()
    buffer = FrameBuffer(4, 64, 48)
    queue = Queue(4)
    keeper = Snapshot('snap', queue, buffer, list(classes), effects=[],
                      stop_event=stop,
                      jpeg_encode=lambda img: b'JPEG' + bytes([img[0, 0, 0]]))
    return stop, buffer, queue, keeper


def push(buffer, queue, keeper, slot, label, confidence, pixel):
    frame = buffer.frames[slot]
    frame.image[:] = pixel
    frame.stamp()
    records = np.zeros(1, DETECTION_DTYPE)
    records[0]['label'] = label
    records[0]['confidence'] = confidence
    records[0]['bbox'] = (1, 1, 40, 40)
    frame.set_detections(records)
    frame.latch.next()
    frame.latch.next(1)
    queue.put(Payload('cam', slot))
    deadline = time.time() + 5
    while frame.latch.state != State.READY and time.time() < deadline:
        time.sleep(0.01)


def test_keeps_best_confidence():
    stop, buffer, queue, keeper = make_rig()
    keeper.start()
    try:
        push(buffer, queue, keeper, 0, 1, 0.6, pixel=10)
        push(buffer, queue, keeper, 1, 1, 0.9, pixel=20)   # better
        push(buffer, queue, keeper, 2, 1, 0.7, pixel=30)   # worse
        data = keeper.get('person')
        assert data == b'JPEG' + bytes([20])
    finally:
        stop.set()
        keeper.join(5)


def test_unknown_or_unseen_class_returns_none():
    stop, buffer, queue, keeper = make_rig()
    assert keeper.get('person') is None      # never sighted
    assert keeper.get('zebra') is None       # not configured
    stop.set()


def test_ttl_expiry_allows_lower_confidence(monkeypatch):
    monkeypatch.setattr(snapshot_module, 'SNAPSHOT_TTL_SECONDS', 0.2)
    stop, buffer, queue, keeper = make_rig()
    keeper.start()
    try:
        push(buffer, queue, keeper, 0, 1, 0.9, pixel=11)
        time.sleep(0.4)                       # stored frame expires
        push(buffer, queue, keeper, 1, 1, 0.4, pixel=22)
        assert keeper.get('person') == b'JPEG' + bytes([22])
    finally:
        stop.set()
        keeper.join(5)


def test_epsilon_bounds_copies():
    """Sub-epsilon confidence improvements must NOT replace the stored
    frame (the round-5 worst-case bound: copies <= (1-c0)/epsilon per TTL
    window), while a >epsilon improvement still does."""
    stop, buffer, queue, keeper = make_rig()
    keeper.start()
    try:
        push(buffer, queue, keeper, 0, 1, 0.600, pixel=10)
        copies = keeper.copies
        assert copies == 1
        # +0.004 < epsilon (0.01): better, but not meaningfully — no copy
        push(buffer, queue, keeper, 1, 1, 0.604, pixel=20)
        assert keeper.copies == copies
        assert keeper.get('person') == b'JPEG' + bytes([10])
        # +0.02 > epsilon: genuine improvement — copy
        push(buffer, queue, keeper, 2, 1, 0.620, pixel=30)
        assert keeper.copies == copies + 1
        assert keeper.get('person') == b'JPEG' + bytes([30])
    finally:
        stop.set()
        keeper.join(5)
