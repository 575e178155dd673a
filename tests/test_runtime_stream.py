"""Scheduler property tests — the three contracts the reference pins in
test_stream.py (/root/reference/watsor/test/test_stream.py):

(a) latest-frame-wins: a slow consumer's lag never exceeds its own period
    (depth-1 queues never accumulate backlog);
(b) fairness: senders sharing one BalancedQueue get near-equal service;
(c) full capacity: when consumers outpace producers, nothing is dropped.
"""

import threading
from queue import Queue
from time import monotonic, sleep

from watsor_tpu.runtime import Read, Work
from watsor_tpu.runtime.channel import balanced_queue_group


class TickRead(Read):
    """Emits (sender, seq, timestamp) at a given rate; counts drops."""

    def __init__(self, name, frame_queue, rate_hz, stop_event=None):
        self.period = 1.0 / rate_hz
        self.sent = 0
        self.dropped = 0
        super().__init__(name, frame_queue, stop_event)

    def _next_frame(self):
        sleep(self.period)
        self.sent += 1
        return (self.name, self.sent, monotonic())

    def _send_frame(self, frame):
        try:
            self.frame_queue.put_nowait(frame)
        except Exception:
            self.dropped += 1


class SlowWork(Work):
    """Consumes at a fixed service time, recording per-sender counts and the
    max staleness (now - send time) observed at pickup."""

    def __init__(self, name, frame_queue, service_s, stop_event=None):
        self.service_s = service_s
        self.counts = {}
        self.max_lag = 0.0
        self._lock = threading.Lock()
        super().__init__(name, frame_queue, stop_event)

    def _next_frame(self, payload):
        sender, _seq, ts = payload
        with self._lock:
            self.counts[sender] = self.counts.get(sender, 0) + 1
            self.max_lag = max(self.max_lag, monotonic() - ts)
        sleep(self.service_s)


def _run_pipeline(readers, workers, seconds):
    stop = threading.Event()
    tasks = readers + workers
    for t in tasks:
        t.stop_event = stop  # share one stop event
        t.initialize()
    for t in tasks:
        t.start()
    sleep(seconds)
    stop.set()
    for t in tasks:
        t.join(5)
        assert not t.is_alive()


def test_latest_frame_wins_lag_bounded():
    """With a depth-1 queue, a frame picked up by the worker was sent at most
    ~one worker period ago: backlog can never accumulate."""
    q = Queue(1)
    reader = TickRead("r", q, rate_hz=200)
    worker = SlowWork("w", q, service_s=0.05)
    _run_pipeline([reader], [worker], 1.5)
    # bound: ~one worker period + generous scheduler jitter (the suite may
    # share one loaded core; the property is "no backlog accumulation",
    # i.e. lag stays O(one period), not O(run duration ~1.5 s))
    assert worker.max_lag < 0.05 + 0.15, worker.max_lag
    assert reader.dropped > 0  # drops happened rather than queueing


def test_balanced_queue_fairness():
    """Two equal-rate senders into one saturated worker get near-equal
    service; an overloaded shared queue can't starve one sender."""
    queues = balanced_queue_group(["a", "b"], maxsize=2)
    ra = TickRead("a", queues["a"], rate_hz=100)
    rb = TickRead("b", queues["b"], rate_hz=100)
    worker = SlowWork("w", queues["a"], service_s=0.02)
    _run_pipeline([ra, rb], [worker], 2.0)
    ca, cb = worker.counts.get("a", 0), worker.counts.get("b", 0)
    assert ca > 10 and cb > 10
    assert abs(ca - cb) <= 2, (ca, cb)  # strict alternation within quota 1


def test_full_capacity_no_drops():
    """Consumers faster than producers: every frame is processed."""
    q = Queue(1)
    reader = TickRead("r", q, rate_hz=50)
    worker = SlowWork("w", q, service_s=0.001)
    _run_pipeline([reader], [worker], 1.0)
    assert reader.dropped == 0
    assert worker.counts.get("r", 0) == reader.sent - (1 if q.qsize() else 0) \
        or worker.counts.get("r", 0) >= reader.sent - 1
