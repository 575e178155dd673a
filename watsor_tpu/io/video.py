"""Video pipeline stages: camera decoder, recorder/broadcast encoder and the
MPEG-TS chunk ring.

The reference drives one ffmpeg subprocess per camera and pumps raw RGB24
through pipes (/root/reference/watsor/stream/ffmpeg.py:19-208, argv built by
config normalization). Here decoding runs in-process through the native
runtime (watsor_tpu/native/video_io.cpp): ``_new_frame`` hands the arena
slot's memory straight to libswscale, and a detect-resolution plane is
produced in the same pass. The ffmpeg argv from the YAML config is still
accepted — recognized flags are translated to native options so existing
watsor configs work unchanged.

Lifecycle parity: EOF ends the spin gracefully (the watchdog then restarts
the decoder — automatic reconnect); MQTT 'OFF' sets the decoder's stop
event, 'ON' clears it and the watchdog resurrects it
(/root/reference/watsor/stream/ffmpeg.py:70-76, watch.py:32-53).
"""

import logging
import os

import numpy as np

from watsor_tpu.io import native
from watsor_tpu.runtime.frames import FrameBuffer
from watsor_tpu.runtime.meters import FramesPerSecond, RateLimiter
from watsor_tpu.runtime.tasks import Payload, ReadDetectPublish, WorkPublish
from watsor_tpu.runtime.channel import Publish

# ffmpeg argv flags translated into native AVFormat options; everything else
# in the argv (pipe plumbing, rawvideo flags) is owned by the framework now.
_ARGV_OPTION_FLAGS = {
    '-rtsp_transport': 'rtsp_transport',
    '-timeout': 'timeout',
    '-stimeout': 'stimeout',
    '-user_agent': 'user_agent',
    '-analyzeduration': 'analyzeduration',
    '-probesize': 'probesize',
}


def decoder_options_from_argv(argv):
    """Extract (options_string, realtime) from a watsor-style ffmpeg decoder
    argv (/root/reference/watsor/config/loader.py:215-237 builds these)."""
    options = []
    realtime = False
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == '-re':
            realtime = True
        elif arg in _ARGV_OPTION_FLAGS and i + 1 < len(argv):
            options.append('{}={}'.format(_ARGV_OPTION_FLAGS[arg], argv[i + 1]))
            i += 1
        i += 1
    return ','.join(options), realtime


class VideoDecoder(ReadDetectPublish):
    """Camera head: decodes into the ring's arena slots and launches the
    detect+publish protocol per frame."""

    def __init__(self, name, frame_queue, frame_buffer: FrameBuffer, url,
                 stop_event=None, options='', realtime=None,
                 rate_limiter=None):
        self._url = url
        self._options = options
        # files default to paced playback (the CLI analog is `-re`)
        if realtime is None:
            realtime = os.path.exists(url)
        self._realtime = realtime
        self._decoder = None
        self.rate_limiter = rate_limiter if rate_limiter is not None \
            else RateLimiter()
        self.fps = FramesPerSecond()
        super().__init__(name, frame_queue, frame_buffer, stop_event)

    def initialize(self):
        super().initialize()
        self._close_decoder()

    def _open_decoder(self):
        frame = self.frame_buffer.frames[0]
        h, w = frame.image.shape[:2]
        detect_hw = None
        if frame.detect_plane is not None:
            detect_hw = frame.detect_plane.shape[:2]
        self._decoder = native.Decoder(self._url, w, h, detect_hw=detect_hw,
                                       options=self._options,
                                       realtime=self._realtime)

    def _close_decoder(self):
        if self._decoder is not None:
            try:
                self._decoder.close()
            except Exception:
                pass
            self._decoder = None

    def _on_start(self):
        self._open_decoder()

    def _on_stop(self):
        self._close_decoder()

    def _new_frame(self, frame):
        if self._decoder is None:
            return False
        try:
            pts = self._decoder.read_into(frame.image, frame.detect_plane)
        except IOError:
            self._logger.exception('Decode error on %s', self.name)
            self.stop_event.set()
            return False
        if pts is None:
            # EOF: stream ended or camera dropped; end the spin so the
            # watchdog reconnects us (unless we were turned off)
            self._logger.info('Stream %s ended', self.name)
            self._end_spin()
            return False
        if not self.rate_limiter.allow():
            return False
        frame.clear()
        frame.stamp()
        self.fps(True)
        return True


class MpegTSRing:
    """Ring of MPEG-TS byte chunks with the same READY/PUBLISH fan-out
    protocol as video frames (the reference stores TS sections in a second
    FrameBuffer, /root/reference/watsor/stream/ffmpeg.py:227-261 +
    main.py:331). Chunk payload lives in the slot's image plane; the valid
    byte count rides in the ``lengths`` sidecar, indexed per slot."""

    CHUNK = 188 * 64  # whole TS sections per chunk

    def __init__(self, size=64):
        self.buffer = FrameBuffer(size, self.CHUNK, 1, 1)
        self.lengths = [0] * size


class VideoEncoder(WorkPublish, Publish):
    """Consumes rendered frames and encodes them: to a file (recording,
    camera `output:` key) and/or to an in-memory MPEG-TS stream fanned out
    to HTTP subscribers through an MpegTSRing."""

    def __init__(self, name, frame_queue, frame_buffer, width, height,
                 fps=30.0, output_path=None, broadcast=False,
                 stop_event=None, codec=None):
        self._width = width
        self._height = height
        self._fps_target = fps if fps and fps > 0 else 30.0
        self._output_path = output_path
        self._broadcast = broadcast
        self._codec = codec
        self._file_encoder = None
        self._ts_encoder = None
        self.ts_ring = MpegTSRing() if broadcast else None
        self._ts_last_index = -1
        self.fps = FramesPerSecond()
        self._wrote_any = False
        WorkPublish.__init__(self, name, frame_queue, frame_buffer, stop_event)
        Publish.__init__(self)

    def initialize(self):
        super().initialize()
        self._close_encoders()

    def _on_start(self):
        if self._output_path:
            self._file_encoder = native.Encoder(
                self._output_path, self._width, self._height,
                fps=self._fps_target, codec=self._codec)
        if self._broadcast:
            self._ts_encoder = native.Encoder(
                'mem:', self._width, self._height, fps=self._fps_target,
                fmt='mpegts', codec=self._codec)

    def _on_stop(self):
        self._close_encoders()

    def _close_encoders(self):
        for enc_attr in ('_file_encoder', '_ts_encoder'):
            enc = getattr(self, enc_attr)
            if enc is not None:
                try:
                    enc.close()
                except Exception:
                    pass
                setattr(self, enc_attr, None)

    def _new_frame(self, frame, payload):
        try:
            if self._file_encoder is not None:
                self._file_encoder.write(frame.image)
            if self._ts_encoder is not None:
                self._ts_encoder.write(frame.image)
                self._pump_ts()
            self._wrote_any = True
            self.fps(True)
        except IOError:
            self._logger.exception('Encode error on %s', self.name)
            self.stop_event.set()
        finally:
            frame.latch.next()

    def _pump_ts(self):
        """Drain encoder output into the TS chunk ring and fan out."""
        while True:
            data = self._ts_encoder.read_bytes(MpegTSRing.CHUNK)
            if not data:
                return
            with self._subscribers_lock:
                n_subs = len(self._subscribers)
                if n_subs == 0:
                    continue  # draining keeps the encoder buffer bounded
                ring = self.ts_ring
                index = ring.buffer.select_next_ready(self._ts_last_index,
                                                      timeout=0.1)
                if index < 0:
                    continue
                self._ts_last_index = index
                slot = ring.buffer.frames[index]
                flat = slot.image.reshape(-1)
                flat[:len(data)] = np.frombuffer(data, np.uint8)
                ring.lengths[index] = len(data)
                slot.stamp()
                slot.latch.next()
                slot.latch.next(n_subs)
                count = self._publish(Payload(self.name, index))
                while count < n_subs:
                    slot.latch.next()
                    count += 1
