"""Integration: the full detection loop with the analytic shape detector —
Artist draws shapes into the ring, the batched ObjectDetector pulls them
through the balanced queue, detections land in the frame headers, and a
counting subscriber confirms the latch protocol end to end (the reference's
test_detect.py strategy, no ML and no hardware required).
"""

import threading

import pytest

from watsor_tpu.detection.detector import ObjectDetector
from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer
from watsor_tpu.testing.shapes import (Artist, ShapeCounter,
                                       ShapeDetectorBackend, SHAPE_LABELS)
from queue import Queue


def test_artist_detector_counter_roundtrip():
    stop = threading.Event()
    buffers = {'cam1': FrameBuffer(10, 160, 120)}
    queues = balanced_queue_group(['cam1'], maxsize=4)

    artist = Artist('cam1', queues['cam1'], buffers['cam1'],
                    stop_event=stop, fps=60, seed=7)
    detector = ObjectDetector('det1', queues['cam1'], buffers,
                              ShapeDetectorBackend((120, 160)),
                              stop_event=stop, max_batch=4)

    counter_queue = Queue(1)
    counter = ShapeCounter('counter', counter_queue, buffers['cam1'],
                           count=20, stop_event=stop)
    artist.subscribe(counter_queue)

    for task in (counter, detector, artist):
        task.start()
    try:
        assert counter.latch.wait(20), "did not see 20 detected frames"
    finally:
        stop.set()
        for task in (artist, detector, counter):
            task.join(5)

    valid = set(SHAPE_LABELS.values())
    assert counter.seen_labels, "no labels recorded"
    assert set(counter.seen_labels) <= valid


def test_two_cameras_share_one_detector_fairly():
    stop = threading.Event()
    cams = ['cam1', 'cam2']
    buffers = {c: FrameBuffer(10, 160, 120) for c in cams}
    queues = balanced_queue_group(cams, maxsize=len(cams))

    artists = [Artist(c, queues[c], buffers[c], stop_event=stop,
                      fps=60, seed=i) for i, c in enumerate(cams)]
    detector = ObjectDetector('det1', queues['cam1'], buffers,
                              ShapeDetectorBackend((120, 160)),
                              stop_event=stop, max_batch=4)

    counters = []
    for c, artist in zip(cams, artists):
        q = Queue(1)
        counter = ShapeCounter('counter-' + c, q, buffers[c], count=10,
                               stop_event=stop)
        artist.subscribe(q)
        counters.append(counter)

    for task in counters + [detector] + artists:
        task.start()
    try:
        for counter in counters:
            assert counter.latch.wait(20), \
                "camera starved: " + counter.name
    finally:
        stop.set()
        for task in artists + [detector] + counters:
            task.join(5)
