"""Config fidelity: the user's ffmpeg argv must keep working.

The reference passes decoder/encoder argv to ffmpeg verbatim
(/root/reference/watsor/stream/ffmpeg.py:41-42,135-146); the native runtime
translates the flags instead — recognized ones must take effect, unknown
ones must be *warned about*, never silently dropped."""

import logging
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.io import native
from watsor_tpu.io.video import (decoder_args_from_argv,
                                 encoder_args_from_argv)


def test_decoder_argv_full_translation():
    args = decoder_args_from_argv([
        'ffmpeg', '-hide_banner', '-loglevel', 'error', '-nostdin',
        '-fflags', 'nobuffer', '-flags', 'low_delay',
        '-rtsp_transport', 'tcp', '-re',
        '-i', 'rtsp://cam/stream',
        '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
    assert 'fflags=nobuffer' in args.options
    assert 'flags=low_delay' in args.options
    assert 'rtsp_transport=tcp' in args.options
    assert args.realtime
    assert args.input_format is None
    assert args.unknown == []


def test_decoder_input_format_before_input():
    args = decoder_args_from_argv([
        'ffmpeg', '-f', 'v4l2', '-video_size', '640x480', '-i', '/dev/video0',
        '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
    assert args.input_format == 'v4l2'
    assert 'video_size=640x480' in args.options


def test_negative_option_values_translate():
    """'-timeout -1' is valid ffmpeg (infinite/listen); the negative number
    is the VALUE, not an unknown flag."""
    args = decoder_args_from_argv([
        'ffmpeg', '-timeout', '-1', '-max_delay', '-1',
        '-i', 'rtsp://cam', '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
    assert 'timeout=-1' in args.options
    assert 'max_delay=-1' in args.options
    assert args.unknown == []


def test_decoder_unknown_flags_collected():
    args = decoder_args_from_argv([
        'ffmpeg', '-hwaccel', 'cuda', '-vf', 'scale=640:480',
        '-i', 'rtsp://cam', '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
    assert '-hwaccel' in args.unknown
    assert '-vf' in args.unknown


def test_encoder_argv_translation():
    args = encoder_args_from_argv([
        'ffmpeg', '-hide_banner', '-f', 'rawvideo', '-pix_fmt', 'rgb24',
        '-s', '640x480', '-i', '-', '-an', '-f', 'mp4',
        '-vcodec', 'libx264', '-b:v', '2M', '-r', '25',
        '-preset', 'slow', '-profile:v', 'high', '-pix_fmt', 'yuv420p',
        'out.mp4'])
    assert args.codec == 'libx264'
    assert args.bit_rate == 2_000_000
    assert args.fps == 25
    assert 'preset=slow' in args.options
    assert 'profile=high' in args.options
    assert args.unknown == []


def test_encoder_unknown_flag_collected():
    args = encoder_args_from_argv([
        'ffmpeg', '-f', 'rawvideo', '-i', '-', '-movflags', '+faststart',
        'out.mp4'])
    assert '-movflags' in args.unknown


def test_decoder_unknown_flag_warning_logged(tmp_path, caplog):
    """Application warns for every untranslated decoder flag
    (VERDICT: at minimum warn instead of silently dropping)."""
    from watsor_tpu.main import Application
    import argparse
    app = Application(args=argparse.Namespace(model_path=None))
    from watsor_tpu.runtime.frames import FrameBuffer
    buffer_in = FrameBuffer(2, 64, 48)
    camera_config = {
        'input': 'rtsp://nowhere/stream',
        'ffmpeg': {'decoder': ['ffmpeg', '-hwaccel', 'cuda', '-i',
                               'rtsp://nowhere/stream', '-f', 'rawvideo',
                               '-pix_fmt', 'rgb24', '-']},
    }
    with caplog.at_level(logging.WARNING, logger='watsor_tpu.main'):
        app._create_decoder('camx', camera_config, Queue(1), buffer_in, None)
    assert any('-hwaccel' in r.message for r in caplog.records)


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_bitrate_option_changes_encoder_output(tmp_path):
    """A configured bitrate must actually reach the encoder
    (/root/reference/watsor/stream/ffmpeg.py:135-146 contract)."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (20, 144, 176, 3), np.uint8)

    def encode(bit_rate):
        path = str(tmp_path / 'out_{}.mp4'.format(bit_rate))
        enc = native.Encoder(path, 176, 144, fps=10.0, bit_rate=bit_rate)
        for f in frames:
            enc.write(np.ascontiguousarray(f))
        enc.close()
        import os
        return os.path.getsize(path)

    small = encode(80_000)
    big = encode(4_000_000)
    assert big > small * 1.5, (small, big)


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_encoder_options_reach_codec(tmp_path):
    """preset/profile options string is accepted by the codec open."""
    path = str(tmp_path / 'opt.mp4')
    enc = native.Encoder(path, 176, 144, fps=10.0,
                         options='preset=ultrafast,profile=baseline')
    enc.write(np.zeros((144, 176, 3), np.uint8))
    enc.close()


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_libav_errors_routed_to_logging(tmp_path, caplog):
    """A bad input must produce a structured libav log record — parity with
    the reference's ffmpeg-stderr pump
    (/root/reference/watsor/stream/ffmpeg.py:211-224)."""
    bad = tmp_path / 'garbage.mp4'
    bad.write_bytes(b'\x00\x01\x02 this is not an mp4 file' * 64)
    with caplog.at_level(logging.DEBUG, logger='watsor_tpu.libav'):
        with pytest.raises(IOError):
            native.Decoder(str(bad), 64, 48)
        native.drain_logs()
    assert any(r.name == 'watsor_tpu.libav' for r in caplog.records), \
        'no libav log records captured'
