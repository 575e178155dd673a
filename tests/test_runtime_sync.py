"""Latch/state-machine semantics — contract from the reference's
test_sync.py (/root/reference/watsor/test/test_sync.py)."""

import threading
from time import sleep

from watsor_tpu.runtime import CountDownLatch, State, StateLatch


def test_count_down_latch():
    latch = CountDownLatch(3)
    assert not latch.wait(0)
    assert latch.count_down() == 2
    assert latch.count_down() == 1
    assert latch.count_down() == 0
    assert latch.wait(0)
    # waiters released from another thread
    latch.reset(1)
    result = []
    t = threading.Thread(target=lambda: result.append(latch.wait(5)))
    t.start()
    sleep(0.05)
    latch.count_down()
    t.join(5)
    assert result == [True]


def test_state_cycle():
    assert State.next(State.READY) == State.DETECT
    assert State.next(State.DETECT) == State.PUBLISH
    assert State.next(State.PUBLISH) == State.READY


def test_state_latch_simple_cycle():
    latch = StateLatch()
    assert latch.state == State.READY
    assert latch.next() == (State.READY, State.DETECT)
    assert latch.next() == (State.DETECT, State.PUBLISH)
    assert latch.next() == (State.PUBLISH, State.READY)


def test_state_latch_counted_transitions():
    """next(n) arms the following transition to need n confirmations; the
    max bid across confirmers wins."""
    latch = StateLatch()
    latch.next(2)                      # READY -> DETECT, arm DETECT->PUBLISH = 2
    assert latch.state == State.DETECT
    latch.next()                       # confirmation 1 of 2
    assert latch.state == State.DETECT
    latch.next(3)                      # confirmation 2 of 2 -> PUBLISH, arm 3
    assert latch.state == State.PUBLISH
    latch.next()
    latch.next()
    assert latch.state == State.PUBLISH
    latch.next()
    assert latch.state == State.READY


def test_state_latch_max_bid_wins():
    latch = StateLatch()
    latch.next(2)          # -> DETECT, pending 2
    latch.next(5)          # confirm 1, bid 5
    latch.next(1)          # confirm 2 -> PUBLISH, armed max(5, 1) = 5
    assert latch.state == State.PUBLISH
    for _ in range(4):
        latch.next()
        assert latch.state == State.PUBLISH
    latch.next()
    assert latch.state == State.READY


def test_state_latch_set_next_overrides():
    latch = StateLatch()
    latch.next(2)          # -> DETECT needing 2
    latch.set_next(1)      # sieve-style override
    latch.next()
    assert latch.state == State.PUBLISH


def test_state_latch_wait_for_predicate():
    latch = StateLatch()
    stop = threading.Event()
    # predicate observed while waiting for a state that never comes
    t = threading.Thread(target=lambda: (sleep(0.1), stop.set()))
    t.start()
    assert latch.wait_for(State.PUBLISH, stop.is_set, timeout=5)
    t.join()


def test_state_latch_wait_for_timeout():
    latch = StateLatch()
    stop = threading.Event()
    assert not latch.wait_for(State.PUBLISH, stop.is_set, timeout=0.2)
