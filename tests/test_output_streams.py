"""Output-path units: MPEG-TS broadcast ring + HTTP iterator, zones CLI,
latency meter, decoder argv option translation."""

import threading
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.io import native
from watsor_tpu.io.video import decoder_options_from_argv
from watsor_tpu.runtime.frames import FrameBuffer, State
from watsor_tpu.runtime.meters import LatencyMeter
from watsor_tpu.runtime.tasks import Payload


class TestDecoderArgv:

    def test_recognized_flags_translate(self):
        options, realtime = decoder_options_from_argv([
            'ffmpeg', '-rtsp_transport', 'tcp', '-re', '-i',
            'rtsp://cam/1', '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
        assert 'rtsp_transport=tcp' in options
        assert realtime

    def test_plumbing_only_argv(self):
        options, realtime = decoder_options_from_argv(
            ['ffmpeg', '-i', 'x.mp4', '-f', 'rawvideo', '-pix_fmt',
             'rgb24', '-'])
        assert options == ''
        assert not realtime


class TestLatencyMeter:

    def test_percentiles(self):
        meter = LatencyMeter(capacity=10)
        for v in [10, 20, 30, 40, 50]:
            meter(v)
        assert meter.p50 == 30
        assert meter.percentile(100) == 50

    def test_empty(self):
        assert LatencyMeter().p50 == 0.0

    def test_wraps_capacity(self):
        meter = LatencyMeter(capacity=4)
        for v in range(100):
            meter(v)
        assert meter.p50 >= 96


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
class TestMpegTSBroadcast:

    def test_encoder_fans_ts_chunks_to_http_iterator(self):
        from watsor_tpu.io.video import VideoEncoder
        from watsor_tpu.output.http_stream import MpegTS

        stop = threading.Event()
        buffer_out = FrameBuffer(4, 96, 64)
        encoder_queue = Queue(4)
        encoder = VideoEncoder('enc', encoder_queue, buffer_out, 96, 64,
                               fps=10.0, broadcast=True, stop_event=stop)
        stream = MpegTS('ts-http', encoder, stop_event=stop)
        encoder.start()
        try:
            stream.start()
            # feed frames through the PUBLISH protocol
            for i in range(12):
                frame = buffer_out.frames[i % 4]
                assert frame.latch.wait(State.READY, 5)
                frame.image[:] = (i * 20) % 255
                frame.stamp()
                frame.latch.next()
                frame.latch.next(1)
                encoder_queue.put(Payload('fx', i % 4))
            # iterate the HTTP stream until TS bytes arrive
            data = b''
            for _ in range(20):
                chunk = next(stream)
                data += chunk
                if len(data) >= 188:
                    break
            assert len(data) >= 188
            assert data[0] == 0x47, 'not MPEG-TS sync byte'
        finally:
            stream.close()
            stop.set()
            encoder.join(5)


class TestZonesCli:

    def test_annotate_lists_zones(self, tmp_path):
        import cv2

        from watsor_tpu.zones import annotate

        alpha = np.zeros((60, 80), np.uint8)
        alpha[5:25, 5:35] = 255
        alpha[35:55, 45:75] = 255
        image = np.dstack([np.zeros((60, 80, 3), np.uint8), alpha])
        mask_path = str(tmp_path / 'mask.png')
        out_path = str(tmp_path / 'annotated.png')
        cv2.imwrite(mask_path, image)

        rows, canvas = annotate(mask_path, out_path)
        assert len(rows) == 2
        assert rows[0][0] == 1 and rows[1][0] == 2
        annotated = cv2.imread(out_path)
        assert annotated is not None and annotated.shape == (60, 80, 3)
