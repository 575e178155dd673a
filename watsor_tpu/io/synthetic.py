"""Synthetic camera source: ``synthetic://shapes`` inputs.

Serves two purposes, mirroring the reference's Artist fixture strategy
(SURVEY.md §4): demo/verification without any camera or video file, and
load generation for benchmarks. Draws random moving shapes, stamps frames
and fills the detect-resolution plane exactly as the native decoder would.
"""

import cv2

from watsor_tpu.runtime.meters import FramesPerSecond, RateLimiter
from watsor_tpu.testing.shapes import Artist


class SyntheticDecoder(Artist):
    """Drop-in replacement for VideoDecoder driven by the Artist painter."""

    def __init__(self, name, frame_queue, frame_buffer, stop_event=None,
                 fps=30, seed=None, rate_limiter=None):
        self.rate_limiter = rate_limiter if rate_limiter is not None \
            else RateLimiter()
        self.fps = FramesPerSecond()
        super().__init__(name, frame_queue, frame_buffer, stop_event,
                         fps=fps, seed=seed)

    def _new_frame(self, frame):
        if not super()._new_frame(frame):
            return False
        if not self.rate_limiter.allow():
            return False
        if frame.detect_plane is not None:
            dh, dw = frame.detect_plane.shape[:2]
            cv2.resize(frame.image, (dw, dh), dst=frame.detect_plane,
                       interpolation=cv2.INTER_LINEAR)
        self.fps(True)
        return True
