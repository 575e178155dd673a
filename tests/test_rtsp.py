"""Genuine RTSP network round trip, fully in-process: the native decoder in
RTSP listen mode (server) receives a session announced by the native
encoder (client) over a real socket — exercising the same libavformat RTSP
demuxer path a production camera uses
(/root/reference/watsor/stream/ffmpeg.py drives ffmpeg against rtsp:// the
same way; ROADMAP 'live RTSP soak' gap)."""

import socket
import threading
import time

import numpy as np
import pytest

from watsor_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native video runtime unavailable')


def _free_port():
    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def test_rtsp_round_trip():
    port = _free_port()
    url = 'rtsp://127.0.0.1:{}/cam'.format(port)
    received = {'frames': 0}
    error = {}

    def receiver():
        try:
            dec = native.Decoder(url, 160, 120,
                                 options='rtsp_flags=listen,'
                                         'timeout=20000000')
            buf = np.zeros((120, 160, 3), np.uint8)
            while received['frames'] < 12:
                if dec.read_into(buf) is None:
                    break
                received['frames'] += 1
                received['mean'] = float(buf.mean())
            dec.close()
        except Exception as e:      # surfaced by the main thread's assert
            error['receiver'] = repr(e)

    thread = threading.Thread(target=receiver, daemon=True)
    thread.start()
    time.sleep(0.8)                  # let the listener reach accept()

    encoder = None
    deadline = time.time() + 15
    while encoder is None and time.time() < deadline:
        try:
            encoder = native.Encoder(url, 160, 120, fps=10.0, fmt='rtsp')
        except IOError:
            time.sleep(0.3)
    assert encoder is not None, error

    frame = np.full((120, 160, 3), 200, np.uint8)
    try:
        for _ in range(40):
            if received['frames'] >= 12:
                break
            encoder.write(frame)
            time.sleep(0.02)
    except IOError:
        pass                         # receiver closed first: expected
    finally:
        try:
            encoder.close()
        except IOError:
            pass
    thread.join(20)

    assert not error, error
    assert received['frames'] >= 5, received
    # x264 at low rate is lossy but a flat gray frame survives intact-ish
    assert abs(received['mean'] - 200) < 20, received
