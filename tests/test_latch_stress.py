"""Randomized concurrency stress for the frame-ownership protocol: a
producer, two detector threads and three flaky subscribers hammer one ring
for a few seconds; afterwards every slot must be READY again (no leaked
confirmations) and every frame the producer submitted must have been
either fully processed or cleanly dropped."""

import random
import threading
from queue import Empty, Full, Queue
from time import monotonic, sleep

from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer, State
from watsor_tpu.runtime.tasks import Payload


def test_protocol_never_leaks_slots():
    ring = FrameBuffer(8, 16, 12)
    queues = balanced_queue_group(['cam'], maxsize=4)
    cam_queue = queues['cam']
    subscriber_queues = [Queue(1) for _ in range(3)]
    stop = threading.Event()
    stats = {'sent': 0, 'detected': 0, 'consumed': 0, 'dropped': 0}
    rng = random.Random(0)

    def producer():
        last = -1
        while not stop.is_set():
            index = ring.select_next_ready(last, timeout=0.2)
            if index < 0:
                continue
            last = index
            frame = ring.frames[index]
            frame.stamp()
            frame.latch.next(2)          # detector + publisher confirm
            payload = Payload('cam', index)
            try:
                cam_queue.put_nowait(payload)
            except Full:
                while not frame.latch.wait(State.READY, 0):
                    frame.latch.next()
                stats['dropped'] += 1
                continue
            count = 0
            for q in subscriber_queues:
                try:
                    q.put_nowait(payload)
                    count += 1
                except Full:
                    pass
            frame.latch.next(count)      # publisher confirm, arm fan-in
            if count == 0:
                frame.latch.next()
            stats['sent'] += 1

    def detector():
        while not stop.is_set():
            try:
                payload = cam_queue.get(timeout=0.1)
            except Empty:
                continue
            sleep(rng.random() * 0.002)
            ring.frames[payload.frame_index].latch.next()
            stats['detected'] += 1

    def subscriber(q):
        while not stop.is_set():
            try:
                payload = q.get(timeout=0.1)
            except Empty:
                continue
            frame = ring.frames[payload.frame_index]
            if not frame.latch.wait_for(State.PUBLISH, stop.is_set, 5):
                continue
            sleep(rng.random() * 0.003)   # flaky, slow consumer
            frame.latch.next()
            stats['consumed'] += 1

    threads = [threading.Thread(target=producer, daemon=True)] + \
        [threading.Thread(target=detector, daemon=True) for _ in range(2)] + \
        [threading.Thread(target=subscriber, args=(q,), daemon=True)
         for q in subscriber_queues]
    for t in threads:
        t.start()
    sleep(4)
    stop.set()
    for t in threads:
        t.join(5)

    # drain stragglers: remaining queued payloads get their confirmations
    while True:
        try:
            payload = cam_queue.get_nowait()
        except Empty:
            break
        ring.frames[payload.frame_index].latch.next()
    for q in subscriber_queues:
        while True:
            try:
                payload = q.get_nowait()
            except Empty:
                break
            frame = ring.frames[payload.frame_index]
            if frame.latch.state == State.PUBLISH:
                frame.latch.next()

    deadline = monotonic() + 5
    while monotonic() < deadline:
        states = [f.latch.state for f in ring.frames]
        if all(s == State.READY for s in states):
            break
        sleep(0.05)
    states = [f.latch.state.name for f in ring.frames]
    assert all(s == 'READY' for s in states), \
        'leaked slots after stress: {} (stats {})'.format(states, stats)
    assert stats['sent'] > 100, 'stress produced too little work: ' + \
        str(stats)
    assert stats['detected'] >= stats['sent'] * 0.9
