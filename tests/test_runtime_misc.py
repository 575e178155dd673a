"""Meters, rate limiter and watchdog contracts (reference test_share.py
FPS sections + test_watch.py)."""

from time import sleep

from watsor_tpu.runtime import FramesPerSecond, InferenceTime, RateLimiter, Task, WatchDog


def test_fps_counts():
    fps = FramesPerSecond(window=10)
    for _ in range(20):
        fps(True)
    # 20 frames in the last 10s window -> 2.0 fps
    assert abs(fps.fps - 2.0) < 0.01
    fps.reset()
    assert fps.fps == 0.0


def test_inference_time_average():
    it = InferenceTime()
    it(10.0)
    it(20.0)
    assert abs(it.value - 15.0) < 0.01


def test_rate_limiter_unlimited_by_default():
    rl = RateLimiter()
    assert all(rl.allow() for _ in range(100))


def test_rate_limiter_limits_and_resets():
    rl = RateLimiter()
    rl.limit_rate(2)
    # bucket starts empty-ish: over a short burst only ~rate*dt tokens
    allowed = sum(1 for _ in range(100) if rl.allow())
    assert allowed <= 2
    rl.unlimited()
    assert all(rl.allow() for _ in range(10))
    rl.limit_rate(0)
    assert not rl.allow()


class Stumble(Task):
    """A child that dies immediately (reference dummy_stream.py:72-87)."""

    def __init__(self, name):
        self.starts = 0
        super().__init__(name)

    def _process(self):
        raise SystemExit

    def _run(self):
        self.starts += 1
        try:
            self._process()
        except SystemExit:
            pass


def test_watchdog_restarts_dead_child():
    dog = WatchDog(interval=0.1)
    child = Stumble("stumble")
    child.start()
    sleep(0.05)
    dog.add(child)
    dog.start()
    sleep(1.0)
    dog.stop()
    dog.join(2)
    assert child.starts >= 3


def test_watchdog_respects_shutdown():
    dog = WatchDog(interval=0.05)
    child = Stumble("stopped")
    child.start()
    child.terminate()  # stop event set -> watchdog must NOT restart
    sleep(0.05)
    starts_before = child.starts
    dog.add(child)
    dog.start()
    sleep(0.3)
    dog.stop()
    dog.join(2)
    assert child.starts == starts_before


def test_loop_decoder_cycles_prerendered_frames():
    """synthetic://loop pre-renders once then serves frames by copy,
    filling the detect plane (the cheap 32-camera load generator used by
    the BASELINE #5 experiment, scripts/run_baseline5.py)."""
    from queue import Queue
    import numpy as np
    from watsor_tpu.io.synthetic import LoopDecoder
    from watsor_tpu.runtime.frames import FrameBuffer

    buffer = FrameBuffer(4, 64, 48, detect_hw=(32, 32))
    dec = LoopDecoder('loop', Queue(4), buffer, fps=1000, seed=3)
    frame = buffer.frames[0]
    seen = set()
    for _ in range(LoopDecoder.SEQUENCE + 4):
        assert dec._new_frame(frame)
        assert frame.detect_plane.min() < 250   # shape drawn, plane filled
        seen.add(frame.image.tobytes())
    # it cycles: distinct content, bounded by the sequence length
    assert 2 <= len(seen) <= LoopDecoder.SEQUENCE
    dec.stop_event.set()
