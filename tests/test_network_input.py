"""Network camera input: the native decoder pulls an HTTP stream (the same
libavformat network stack that handles rtsp:// URLs — no RTSP server exists
in CI, so HTTP stands in for the network path)."""

import functools
import http.server
import threading

import numpy as np
import pytest

from watsor_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native video runtime unavailable')


def test_decode_over_http(tmp_path):
    # encode a clip to disk
    path = tmp_path / 'clip.mp4'
    img = np.full((48, 64, 3), 255, np.uint8)
    img[10:40, 20:50] = 0
    with native.Encoder(str(path), 64, 48, fps=10.0) as enc:
        for _ in range(10):
            enc.write(img)

    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(tmp_path))
    server = http.server.ThreadingHTTPServer(('127.0.0.1', 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = 'http://127.0.0.1:{}/clip.mp4'.format(server.server_port)
        decoder = native.Decoder(url, 64, 48)
        full = np.zeros((48, 64, 3), np.uint8)
        n = 0
        while decoder.read_into(full) is not None:
            n += 1
        decoder.close()
        assert n == 10
        assert full[25, 35].mean() < 60      # the rectangle decoded
    finally:
        server.shutdown()
        thread.join(5)
