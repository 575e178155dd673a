"""Native video I/O round trip: encode frames with shapes to a file, decode
them back, confirm the shapes survive compression (the contract of the
reference's test_ffmpeg.py: encode -> pipe -> decode -> detect).

Skipped when the native library can't be built (no toolchain/FFmpeg libs).
"""

import os

import numpy as np
import pytest

from watsor_tpu.io import native
from watsor_tpu.testing.shapes import ShapeDetectorBackend

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native video runtime unavailable')

W, H = 160, 120


def _draw_rect_frame():
    img = np.full((H, W, 3), 255, np.uint8)
    img[30:90, 40:120] = 0
    return img


class TestRoundTrip:

    def test_encode_decode_file(self, tmp_path):
        path = str(tmp_path / 'clip.mp4')
        frames = 25
        img = _draw_rect_frame()
        with native.Encoder(path, W, H, fps=25.0) as enc:
            for _ in range(frames):
                enc.write(img)
        assert os.path.getsize(path) > 0

        dec = native.Decoder(path, W, H, detect_hw=(60, 80))
        full = np.zeros((H, W, 3), np.uint8)
        detect = np.zeros((60, 80, 3), np.uint8)
        n = 0
        while True:
            pts = dec.read_into(full, detect)
            if pts is None:
                break
            n += 1
        dec.close()
        assert n == frames
        # the black rectangle survived compression, full res and detect res
        assert full[60, 80].mean() < 60 and full[5, 5].mean() > 200
        assert detect[30, 40].mean() < 60 and detect[2, 2].mean() > 200

    def test_decoded_shapes_still_detected(self, tmp_path):
        path = str(tmp_path / 'clip2.mp4')
        img = _draw_rect_frame()
        with native.Encoder(path, W, H, fps=10.0) as enc:
            for _ in range(10):
                enc.write(img)
        dec = native.Decoder(path, W, H)
        full = np.zeros((H, W, 3), np.uint8)
        assert dec.read_into(full) is not None
        dec.close()
        backend = ShapeDetectorBackend((H, W))
        boxes, scores, classes, valid, _ = backend.detect_batch(full[None])
        assert valid[0] >= 1
        from watsor_tpu.testing.shapes import SHAPE_LABELS
        assert SHAPE_LABELS['rectangle'] in classes[0][:valid[0]]

    def test_mem_ts_broadcast_stream(self):
        img = _draw_rect_frame()
        enc = native.Encoder('mem:', W, H, fps=10.0, fmt='mpegts')
        total = b''
        for _ in range(30):
            enc.write(img)
            total += enc.read_bytes(1 << 20)
        enc.close()
        assert len(total) > 188
        # MPEG-TS sync byte structure: 0x47 every 188 bytes
        assert total[0] == 0x47 and total[188] == 0x47

    def test_jpeg_encode(self):
        img = _draw_rect_frame()
        data = native.jpeg_encode(img, quality=85)
        assert data[:2] == b'\xff\xd8' and data[-2:] == b'\xff\xd9'
        import cv2
        decoded = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
        assert decoded.shape == (H, W, 3)
