"""Frame ring contracts — from the reference's test_share.py:
cyclic selection, stale-frame reclamation, subscriber coherence under drop
pressure ("the buffer will never overflow"), detections riding in-band."""

import numpy as np

from watsor_tpu.runtime import (
    DETECTION_DTYPE, Frame, FrameBuffer, State,
)
from watsor_tpu.runtime.frames import STALE_FRAME_SECONDS


def test_ring_cyclic_selection():
    fb = FrameBuffer(4, 8, 8)
    order = []
    idx = -1
    for _ in range(8):
        idx = fb.select_next_ready(idx, timeout=0)
        order.append(idx)
    assert order == [0, 1, 2, 3, 0, 1, 2, 3]


def test_ring_skips_busy_slots():
    fb = FrameBuffer(3, 8, 8)
    fb.frames[1].stamp()
    fb.frames[1].latch.next()  # slot 1 -> DETECT
    idx = fb.select_next_ready(0, timeout=0)
    assert idx == 2
    idx = fb.select_next_ready(idx, timeout=0)
    assert idx == 0


def test_ring_exhausted_returns_minus_one():
    fb = FrameBuffer(2, 8, 8)
    for f in fb.frames:
        f.stamp()
        f.latch.next()
    assert fb.select_next_ready(-1, timeout=0) == -1
    assert fb.fullness == 1.0


def test_stale_frame_reclaimed():
    fb = FrameBuffer(2, 8, 8)
    from time import time
    for f in fb.frames:
        f.stamp(time() - STALE_FRAME_SECONDS - 1)
        f.latch.next()   # stuck in DETECT
    idx = fb.select_next_ready(-1, timeout=0)
    assert idx >= 0
    assert fb.frames[idx].latch.state == State.READY


def test_arena_is_contiguous_and_views_alias():
    fb = FrameBuffer(3, 4, 2)  # width=4, height=2
    assert fb.arena.shape == (3, 2, 4, 3)
    fb.frames[1].image[:] = 7
    assert (fb.arena[1] == 7).all()
    assert (fb.arena[0] == 0).all()


def test_detections_in_band():
    fb = FrameBuffer(1, 8, 8)
    frame = fb.frames[0]
    recs = np.zeros(2, dtype=DETECTION_DTYPE)
    recs[0]['label'] = 1
    recs[0]['confidence'] = 0.9
    recs[0]['bbox'] = (1, 2, 3, 4)
    recs[1]['label'] = 3
    frame.set_detections(recs)
    out = frame.detections_view()
    assert len(out) == 2
    assert out[0]['label'] == 1
    assert np.isclose(out[0]['confidence'], 0.9)
    frame.clear()
    assert len(frame.detections_view()) == 0


def test_full_fan_out_cycle():
    """Decoder -> detector -> sieve -> 3 subscribers, counted release."""
    fb = FrameBuffer(2, 8, 8)
    frame = fb.frames[0]
    frame.stamp()

    frame.latch.next(2)         # decoder: READY -> DETECT (detector + publisher)
    assert frame.latch.state == State.DETECT
    frame.latch.next()          # detector confirms
    frame.latch.next(1)         # publisher confirms; 1 sieve subscriber reached
    assert frame.latch.state == State.PUBLISH

    frame.latch.set_next(3)     # sieve re-arms with its 3 subscribers
    for _ in range(2):
        frame.latch.next()
        assert frame.latch.state == State.PUBLISH
    frame.latch.next()
    assert frame.latch.state == State.READY
