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

# ffmpeg argv flags translated into native AVOptions (applied to both the
# demuxer and the decoder context — libav consumes what each layer knows);
# pipe plumbing and rawvideo flags are owned by the framework now.
_ARGV_OPTION_FLAGS = {
    '-rtsp_transport': 'rtsp_transport',
    '-rtsp_flags': 'rtsp_flags',
    '-timeout': 'timeout',
    '-stimeout': 'stimeout',
    '-user_agent': 'user_agent',
    '-analyzeduration': 'analyzeduration',
    '-probesize': 'probesize',
    '-fflags': 'fflags',
    '-flags': 'flags',
    '-max_delay': 'max_delay',
    '-buffer_size': 'buffer_size',
    '-reorder_queue_size': 'reorder_queue_size',
    '-use_wallclock_as_timestamps': 'use_wallclock_as_timestamps',
    '-r': 'framerate',
    '-framerate': 'framerate',
    '-video_size': 'video_size',
    '-input_format': 'input_format',
}

# flags that are cosmetic or implied by the in-process design: accepted
# silently, with or without their value
_ARGV_NOOP_FLAGS = frozenset((
    '-hide_banner', '-nostdin', '-nostats', '-y', '-an', '-sn', '-dn',
))
_ARGV_NOOP_VALUE_FLAGS = frozenset(('-loglevel', '-threads'))

# output-side plumbing the schema requires and the framework owns
# (/root/reference/watsor/config/schema.py:161): skipped with their value
_ARGV_PLUMBING_VALUE_FLAGS = frozenset(('-f', '-pix_fmt', '-s', '-vcodec',
                                        '-c:v', '-codec:v'))


def _is_option_value(token):
    """True when the next argv token is an option VALUE: anything not
    '-'-prefixed, plus negative numbers ('-timeout -1' is valid ffmpeg);
    a bare '-' is the pipe placeholder, never a value."""
    if token == '-':
        return False
    if not token.startswith('-'):
        return True
    return len(token) > 1 and (token[1].isdigit() or token[1] == '.')


class DecoderArgs:
    """Decoded form of a watsor-style ffmpeg decoder argv."""

    def __init__(self, options, realtime, input_format, unknown):
        self.options = options            # 'key=value,...' AVOptions
        self.realtime = realtime          # ffmpeg -re
        self.input_format = input_format  # ffmpeg -f before -i (v4l2, ...)
        self.unknown = unknown            # untranslated flags, for warnings


def decoder_args_from_argv(argv):
    """Translate a watsor-style ffmpeg decoder argv
    (/root/reference/watsor/config/loader.py:215-237 builds these:
    ``['ffmpeg', <input flags>, '-i', url, <rawvideo plumbing>, '-']``).

    Flags before ``-i`` configure the input (translated to AVOptions /
    input format); everything after it is the rawvideo pipe contract the
    framework owns. Untranslated flags are collected in ``unknown`` so the
    caller can warn instead of silently dropping user intent."""
    options = []
    realtime = False
    input_format = None
    unknown = []
    try:
        input_end = argv.index('-i')
    except ValueError:
        input_end = len(argv)
    i = 0
    while i < len(argv):
        arg = argv[i]
        before_input = i < input_end
        has_value = i + 1 < len(argv) and _is_option_value(argv[i + 1])
        if arg == 'ffmpeg' or arg == '-' or not arg.startswith('-'):
            pass                     # program name, pipes, option values
        elif arg == '-re':
            realtime = True
        elif arg == '-i':
            i += 1                   # the input URL follows
        elif arg == '-f' and before_input and has_value:
            input_format = argv[i + 1]
            i += 1
        elif arg in _ARGV_OPTION_FLAGS and before_input and has_value:
            options.append('{}={}'.format(_ARGV_OPTION_FLAGS[arg],
                                          argv[i + 1]))
            i += 1
        elif arg in _ARGV_NOOP_FLAGS:
            pass
        elif arg in _ARGV_NOOP_VALUE_FLAGS:
            i += 1 if has_value else 0
        elif not before_input and arg in _ARGV_PLUMBING_VALUE_FLAGS:
            i += 1 if has_value else 0
        else:
            unknown.append(arg)
            i += 1 if has_value else 0
        i += 1
    return DecoderArgs(','.join(options), realtime, input_format, unknown)


def decoder_options_from_argv(argv):
    """Back-compat shim: (options_string, realtime)."""
    args = decoder_args_from_argv(argv)
    return args.options, args.realtime


# encoder argv flags translated onto the native encoder: codec selection,
# rate control and x264 tuning (the reference passes the user's argv to
# ffmpeg verbatim, /root/reference/watsor/stream/ffmpeg.py:135-146)
_ENCODER_VALUE_FLAGS = {
    '-preset': 'preset',
    '-tune': 'tune',
    '-profile:v': 'profile',
    '-profile': 'profile',
    '-crf': 'crf',
    '-g': 'g',
    '-bf': 'bf',
    '-maxrate': 'maxrate',
    '-bufsize': 'bufsize',
    '-level': 'level',
    '-x264-params': 'x264-params',
    '-x264opts': 'x264opts',
}


def _parse_bitrate(text):
    """ffmpeg-style '2M'/'2000k'/'2000000' -> bits per second."""
    text = str(text).strip()
    scale = 1
    if text[-1:].lower() == 'k':
        scale, text = 1000, text[:-1]
    elif text[-1:].lower() == 'm':
        scale, text = 1000000, text[:-1]
    try:
        return int(float(text) * scale)
    except ValueError:
        return 0


class EncoderArgs:
    """Decoded form of a watsor-style ffmpeg encoder argv."""

    def __init__(self, codec, bit_rate, fps, options, unknown):
        self.codec = codec          # libav encoder name ('libx264', ...)
        self.bit_rate = bit_rate    # bits/s, 0 = native default
        self.fps = fps              # -r on the OUTPUT side, None = source
        self.options = options      # 'key=value,...' codec AVOptions
        self.unknown = unknown


def encoder_args_from_argv(argv):
    """Translate a normalized encoder argv
    (``['ffmpeg', <rawvideo in>, '-s', 'WxH', '-i', '-', <output flags>,
    target]``). Flags before ``-i`` describe the rawvideo pipe the
    framework owns; flags after it are the user's encoder tuning and are
    honored (codec, bitrate, fps, preset/profile/tune/crf/gop)."""
    codec = None
    bit_rate = 0
    fps = None
    options = []
    unknown = []
    try:
        start = argv.index('-i') + 2  # skip '-i' and the pipe token
    except ValueError:
        start = 0
    i = start
    while i < len(argv):
        arg = argv[i]
        has_value = i + 1 < len(argv) and _is_option_value(argv[i + 1])
        if not arg.startswith('-') or arg == '-':
            pass                     # output target / option values
        elif arg in ('-vcodec', '-c:v', '-codec:v') and has_value:
            codec = argv[i + 1]
            i += 1
        elif arg in ('-b:v', '-b') and has_value:
            bit_rate = _parse_bitrate(argv[i + 1])
            i += 1
        elif arg == '-r' and has_value:
            try:
                fps = float(argv[i + 1])
            except ValueError:
                pass
            i += 1
        elif arg in _ENCODER_VALUE_FLAGS and has_value:
            options.append('{}={}'.format(_ENCODER_VALUE_FLAGS[arg],
                                          argv[i + 1]))
            i += 1
        elif arg in ('-f', '-pix_fmt') and has_value:
            i += 1                   # container by destination; yuv420p fixed
        elif arg in _ARGV_NOOP_FLAGS:
            pass
        elif arg in _ARGV_NOOP_VALUE_FLAGS:
            i += 1 if has_value else 0
        else:
            unknown.append(arg)
            i += 1 if has_value else 0
        i += 1
    # ffmpeg maps codec aliases; honor the common ones
    if codec in ('h264', 'x264'):
        codec = 'libx264'
    return EncoderArgs(codec, bit_rate, fps, ','.join(options), unknown)


class VideoDecoder(ReadDetectPublish):
    """Camera head: decodes into the ring's arena slots and launches the
    detect+publish protocol per frame."""

    def __init__(self, name, frame_queue, frame_buffer: FrameBuffer, url,
                 stop_event=None, options='', realtime=None,
                 rate_limiter=None, input_format=None):
        self._url = url
        self._options = options
        self._input_format = input_format
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
                                       realtime=self._realtime,
                                       input_format=self._input_format)

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
                 stop_event=None, codec=None, bit_rate=0, options=None):
        self._width = width
        self._height = height
        self._fps_target = fps if fps and fps > 0 else 30.0
        self._output_path = output_path
        self._broadcast = broadcast
        self._codec = codec
        self._bit_rate = bit_rate
        self._options = options
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
                fps=self._fps_target, codec=self._codec,
                bit_rate=self._bit_rate, options=self._options)
        if self._broadcast:
            self._ts_encoder = native.Encoder(
                'mem:', self._width, self._height, fps=self._fps_target,
                fmt='mpegts', codec=self._codec,
                bit_rate=self._bit_rate, options=self._options)

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
