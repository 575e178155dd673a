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
        'ffmpeg', '-itsoffset', '2', '-vf', 'hflip',
        '-i', 'rtsp://cam', '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])
    assert '-itsoffset' in args.unknown
    assert any('hflip' in u for u in args.unknown)


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
        'ffmpeg': {'decoder': ['ffmpeg', '-itsoffset', '2', '-i',
                               'rtsp://nowhere/stream', '-f', 'rawvideo',
                               '-pix_fmt', 'rgb24', '-']},
    }
    with caplog.at_level(logging.WARNING, logger='watsor_tpu.main'):
        app._create_decoder('camx', camera_config, Queue(1), buffer_in, None)
    assert any('-itsoffset' in r.message for r in caplog.records)


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


# --- README Tips argv fidelity -----------------------------------------------
# Every example argv in the reference README Tips
# (/root/reference/README.md:173-243) and the shipped demo config
# (/root/reference/config/config.yaml:18-63) must translate warning-free.

def _dec(flags):
    return decoder_args_from_argv(
        ['ffmpeg'] + flags + ['-i', 'rtsp://cam/stream',
                              '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'])


def test_tips_fps_filter():
    args = _dec(['-filter:v', 'fps=fps=10'])
    assert args.unknown == []
    assert args.filter_fps == 10


def test_tips_scale_filter():
    args = _dec(['-filter:v', 'scale=640:480'])
    assert args.unknown == []


def test_tips_combined_filters():
    args = _dec(['-filter:v', 'fps=fps=10,scale=640:480'])
    assert args.unknown == []
    assert args.filter_fps == 10


def test_tips_hwaccel_decode():
    args = _dec(['-hwaccel', 'vaapi', '-hwaccel_device',
                 '/dev/dri/renderD128', '-hwaccel_output_format', 'yuv420p'])
    assert args.unknown == []
    assert args.hwaccel == 'vaapi'
    assert args.hwaccel_device == '/dev/dri/renderD128'


def test_tips_fluent_video_encoder_trick():
    """README.md:215-243: input throttled to 10 FPS with -vsync drop,
    output duplicated up to constant 30000/1001 with -vsync cfr."""
    args = encoder_args_from_argv([
        'ffmpeg', '-hide_banner', '-f', 'rawvideo', '-pix_fmt', 'rgb24',
        '-r', '10', '-vsync', 'drop', '-i', '-', '-an', '-f', 'mpegts',
        '-r', '30000/1001', '-vsync', 'cfr', '-vcodec', 'libx264',
        '-pix_fmt', 'yuv420p'])
    assert args.unknown == []
    assert args.input_fps == 10
    assert args.cfr
    assert abs(args.fps - 30000 / 1001) < 1e-9
    assert args.format == 'mpegts'
    assert args.codec == 'libx264'


def test_reference_demo_config_decoder_translates_clean():
    """/root/reference/config/config.yaml:19-39 decoder argv."""
    args = decoder_args_from_argv([
        'ffmpeg', '-hide_banner', '-loglevel', 'error', '-nostdin',
        '-hwaccel', 'vaapi', '-hwaccel_device', '/dev/dri/renderD128',
        '-hwaccel_output_format', 'yuv420p',
        '-fflags', 'nobuffer', '-flags', 'low_delay',
        '-fflags', '+genpts+discardcorrupt',
        '-i', 'rtsp://cam/stream', '-f', 'rawvideo', '-pix_fmt', 'rgb24',
        '-'])
    assert args.unknown == []
    assert args.hwaccel == 'vaapi'


def test_reference_demo_config_encoder_translates_clean():
    """/root/reference/config/config.yaml:40-63 encoder argv, including the
    drawtext localtime overlay."""
    args = encoder_args_from_argv([
        'ffmpeg', '-hide_banner', '-loglevel', 'error',
        '-hwaccel', 'vaapi', '-hwaccel_device', '/dev/dri/renderD128',
        '-hwaccel_output_format', 'yuv420p',
        '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-i', '-', '-an',
        '-f', 'mpegts', '-vcodec', 'libx264', '-pix_fmt', 'yuv420p',
        '-vf',
        "drawtext='text=%{localtime\\:%c}': x=w-tw-lh: y=h-2*lh: "
        "fontcolor=white: box=1: boxcolor=black@0.55"])
    assert args.unknown == []
    assert args.format == 'mpegts'
    assert args.drawtext is not None


def test_drawtext_overlay_renders_timestamp():
    from watsor_tpu.io.video import DrawTextOverlay
    overlay = DrawTextOverlay(
        "'text=%{localtime\\:%c}': x=w-tw-lh: y=h-2*lh: fontcolor=white: "
        "box=1: boxcolor=black@0.55")
    image = np.zeros((240, 320, 3), np.uint8)
    overlay.apply(image)
    assert image.any(), 'timestamp not rendered'
    # text lands in the lower half (y = h-2*lh)
    ys = np.nonzero(image.any(axis=(1, 2)))[0]
    assert ys.min() > 120


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_filter_fps_drops_frames(tmp_path):
    """-vf fps=fps=N halves the decoded frame count of a 2N-fps file."""
    path = str(tmp_path / 'in.mp4')
    enc = native.Encoder(path, 176, 144, fps=20.0)
    for i in range(40):
        enc.write(np.full((144, 176, 3), i * 5, np.uint8))
    enc.close()

    def count(filter_fps):
        dec = native.Decoder(path, 176, 144, filter_fps=filter_fps)
        buf = np.empty((144, 176, 3), np.uint8)
        n = 0
        while dec.read_into(buf) is not None:
            n += 1
        dec.close()
        return n

    full = count(0.0)
    half = count(10.0)
    assert full >= 35, full
    assert half <= full // 2 + 2, (full, half)
    assert half >= full // 2 - 2, (full, half)


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_unknown_hwaccel_falls_back_to_software(tmp_path, caplog):
    """A hwaccel method that isn't usable on this host must warn and decode
    in software, not fail (ffmpeg CLI non-strict behavior)."""
    path = str(tmp_path / 'in.mp4')
    enc = native.Encoder(path, 176, 144, fps=10.0)
    for i in range(5):
        enc.write(np.full((144, 176, 3), 100 + i, np.uint8))
    enc.close()
    with caplog.at_level(logging.DEBUG, logger='watsor_tpu.libav'):
        dec = native.Decoder(path, 176, 144, hwaccel='nosuchaccel')
        buf = np.empty((144, 176, 3), np.uint8)
        assert dec.read_into(buf) is not None
        dec.close()
        native.drain_logs()
    assert any('nosuchaccel' in r.message for r in caplog.records)


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_cfr_duplicates_to_constant_rate(tmp_path):
    """-vsync cfr: writing ~5 real FPS for 1s at out_fps=25 produces ~25
    encoded frames (duplication fills the gaps)."""
    from time import sleep
    path = str(tmp_path / 'cfr.mp4')
    enc = native.Encoder(path, 176, 144, fps=25.0, cfr=True)
    for i in range(6):
        enc.write(np.full((144, 176, 3), i * 30, np.uint8))
        sleep(0.2)
    enc.close()
    dec = native.Decoder(path, 176, 144)
    buf = np.empty((144, 176, 3), np.uint8)
    n = 0
    while dec.read_into(buf) is not None:
        n += 1
    dec.close()
    assert n >= 20, n  # ~1.0-1.2s of wall time at 25 fps


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_encoder_input_fps_paces_writes(tmp_path):
    """-r before -i with -vsync drop: frames written faster than the
    declared rate are dropped."""
    path = str(tmp_path / 'paced.mp4')
    enc = native.Encoder(path, 176, 144, fps=30.0, input_fps=5.0)
    for i in range(30):  # burst-written: ~instantaneous
        enc.write(np.full((144, 176, 3), i * 8, np.uint8))
    enc.close()
    dec = native.Decoder(path, 176, 144)
    buf = np.empty((144, 176, 3), np.uint8)
    n = 0
    while dec.read_into(buf) is not None:
        n += 1
    dec.close()
    assert n <= 3, n  # a burst collapses to the first frame (+slack)


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_muxer_override_by_format_flag(tmp_path):
    """-f <muxer> picks the container regardless of file extension."""
    path = str(tmp_path / 'stream.bin')
    enc = native.Encoder(path, 176, 144, fps=10.0, fmt='mpegts')
    for i in range(5):
        enc.write(np.full((144, 176, 3), 50 + i * 20, np.uint8))
    enc.close()
    with open(path, 'rb') as f:
        first = f.read(1)
    assert first == b'\x47', first  # MPEG-TS sync byte


# --- round-3 review regressions ----------------------------------------------

def test_filtergraph_quoted_comma_does_not_split():
    args = encoder_args_from_argv([
        'ffmpeg', '-f', 'rawvideo', '-i', '-', '-vf',
        "drawtext=text='Back in 5, stay out': fontcolor=white"])
    assert args.unknown == []
    assert 'Back in 5, stay out' in args.drawtext


def test_drawtext_literal_percent_is_safe():
    from watsor_tpu.io.video import DrawTextOverlay
    overlay = DrawTextOverlay(
        "text='CPU 50% %{localtime\\:%H\\:%M} 100%': box=1")
    image = np.zeros((120, 320, 3), np.uint8)
    overlay.apply(image)          # must not raise
    assert image.any()


def test_input_r_without_vsync_drop_never_drops():
    """A bare input-side -r declares the rawvideo rate; ffmpeg only drops
    with -vsync drop."""
    args = encoder_args_from_argv([
        'ffmpeg', '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-r', '30',
        '-i', '-', '-vcodec', 'libx264', 'out.mp4'])
    assert args.input_fps is None
    args = encoder_args_from_argv([
        'ffmpeg', '-f', 'rawvideo', '-r', '10', '-vsync', 'drop',
        '-i', '-', 'out.mp4'])
    assert args.input_fps == 10


def test_fetch_refuses_symlink_members(tmp_path):
    import tarfile
    from watsor_tpu.models.fetch import FetchError, _safe_extract
    evil = tmp_path / 'evil.tar'
    with tarfile.open(evil, 'w') as tar:
        info = tarfile.TarInfo('link')
        info.type = tarfile.SYMTYPE
        info.linkname = '/usr/share'
        tar.addfile(info)
    with pytest.raises(FetchError, match='escapes destination'):
        _safe_extract(str(evil), str(tmp_path / 'out'))


@pytest.mark.skipif(not native.available(),
                    reason='native video runtime unavailable')
def test_filter_fps_survives_missing_timestamps(tmp_path):
    """Raw elementary streams have no usable pts; the fps filter must
    pass frames through instead of dropping everything after the first
    (which would wedge the live read loop)."""
    path = str(tmp_path / 'raw.h264')
    enc = native.Encoder(path, 176, 144, fps=20.0, fmt='h264')
    for i in range(20):
        enc.write(np.full((144, 176, 3), i * 10, np.uint8))
    enc.close()
    dec = native.Decoder(path, 176, 144, filter_fps=5.0)
    buf = np.empty((144, 176, 3), np.uint8)
    n = 0
    while dec.read_into(buf) is not None:
        n += 1
    dec.close()
    assert n >= 15, n   # no timestamps -> no dropping, stream not wedged


def test_drawtext_expressions_are_sandboxed():
    """Position expressions parse through a whitelisted AST walker —
    arbitrary Python in a camera config must not execute."""
    from watsor_tpu.io.video import DrawTextOverlay
    flag = {'ran': False}

    class Evil:
        def __index__(self):
            flag['ran'] = True
            return 1
    # attribute access / calls / subscripts are all rejected
    for expr in ("().__class__.__base__.__subclasses__()",
                 "__import__('os').system('true')",
                 "[1][0]", "(lambda: 1)()"):
        overlay = DrawTextOverlay("text='x': x={}: y=10".format(expr))
        image = np.zeros((60, 120, 3), np.uint8)
        overlay.apply(image)       # falls back to defaults, renders
        assert image.any()
    assert not flag['ran']
    # legitimate arithmetic still works
    overlay = DrawTextOverlay("text='x': x=w-tw-lh: y=h-2*lh")
    x, y = overlay._position(320, 240, 50, 10)
    assert 0 <= x <= 270 and y > 120
