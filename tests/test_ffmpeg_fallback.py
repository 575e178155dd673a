"""Subprocess-ffmpeg fallback decoder (WATSOR_FFMPEG_FALLBACK=1): when the
native argv translation reports unknown flags, the user's decoder argv runs
VERBATIM through a real ffmpeg binary and rawvideo rgb24 is piped into the
arena — restoring the reference's any-option compatibility
(/root/reference/watsor/stream/ffmpeg.py:19-110, argv assembled by
config/loader.py:215-237). No ffmpeg binary exists on this rig, so the
tests drive a stub executable that records its argv and emits rawvideo.
"""

import json
import os
import stat
import sys
import threading
import time
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.io.video import (FallbackVideoDecoder, _FFmpegProcess,
                                 decoder_args_from_argv)
from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer

W, H = 96, 64
DETECT_HW = (32, 48)

# an argv using flags the native whitelist cannot translate (-ss seek and
# an exotic -vf chain) — exactly the configs the fallback exists for
EXOTIC_ARGV = ['ffmpeg', '-nostdin', '-ss', '1', '-i', 'camera.mp4',
               '-vf', 'hue=s=0', '-f', 'rawvideo', '-pix_fmt', 'rgb24',
               '-']


def _write_stub(tmp_path, n_frames=40, pace=0.0):
    """A fake ffmpeg: records its argv to argv.json, then streams
    ``n_frames`` rawvideo rgb24 frames (white with a moving black
    rectangle) to stdout. ``pace`` sleeps between frames — a real camera
    delivers at its frame interval, and an unpaced burst lets the decoder
    outrun the depth-2 detector queue (drop-on-Full is the designed
    backpressure), which under CI load can drop nearly every frame."""
    argv_file = tmp_path / 'argv.json'
    stub = tmp_path / 'ffmpeg'
    stub.write_text(
        '#!{py}\n'
        'import json, sys, time\n'
        'import numpy as np\n'
        'json.dump(sys.argv[1:], open({argv!r}, "w"))\n'
        'out = sys.stdout.buffer\n'
        'for i in range({n}):\n'
        '    img = np.full(({h}, {w}, 3), 255, np.uint8)\n'
        # even-aligned edges survive the 2:1 bilinear detect-plane resize
        # crisp, and the rectangle is large enough that the analytic
        # backend's discrete fill ratio stays above its 0.9 cutoff
        '    x = 2 + 2 * (i % 3)\n'
        '    img[18:46, x:x + 88] = 0\n'
        '    out.write(img.tobytes())\n'
        '    if {pace!r}:\n'
        '        out.flush()\n'
        '        time.sleep({pace!r})\n'
        'out.flush()\n'.format(py=sys.executable, argv=str(argv_file),
                               n=n_frames, h=H, w=W, pace=pace))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return str(stub), argv_file


def test_exotic_flags_are_untranslatable():
    # precondition for the whole feature: the whitelist really can't
    # express this argv (if it ever learns to, the fallback won't engage)
    args = decoder_args_from_argv(EXOTIC_ARGV)
    assert args.unknown, args.unknown


def test_ffmpeg_process_reads_frames_and_eof(tmp_path, monkeypatch):
    stub, argv_file = _write_stub(tmp_path, n_frames=3)
    monkeypatch.setenv('WATSOR_FFMPEG_BIN', stub)
    proc = _FFmpegProcess(EXOTIC_ARGV, W, H)
    try:
        image = np.zeros((H, W, 3), np.uint8)
        detect = np.zeros(DETECT_HW + (3,), np.uint8)
        pts = []
        for _ in range(3):
            pts.append(proc.read_into(image, detect))
        assert pts == [1, 2, 3]
        # the frame content arrived (white background, black rectangle)
        assert image[0, 0, 0] == 255 and (image == 0).any()
        # the detect-resolution plane was filled in the same pass
        assert detect.max() == 255 and detect.min() < 128
        assert proc.read_into(image, detect) is None      # clean EOF
        # the stub saw the user's argv VERBATIM (minus the program name)
        recorded = json.loads(argv_file.read_text())
        assert recorded == EXOTIC_ARGV[1:]
    finally:
        proc.close()


def test_ffmpeg_process_failure_raises(tmp_path, monkeypatch):
    stub = tmp_path / 'ffmpeg'
    stub.write_text('#!{py}\nimport sys\n'
                    'sys.stderr.write("boom: bad option\\n")\n'
                    'sys.exit(1)\n'.format(py=sys.executable))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv('WATSOR_FFMPEG_BIN', str(stub))
    proc = _FFmpegProcess(EXOTIC_ARGV, W, H)
    try:
        image = np.zeros((H, W, 3), np.uint8)
        time.sleep(0.2)               # let stderr drain
        with pytest.raises(IOError) as err:
            proc.read_into(image)
        assert 'boom' in str(err.value) or 'status 1' in str(err.value)
    finally:
        proc.close()


def test_fallback_decoder_end_to_end(tmp_path, monkeypatch):
    """The full pipeline leg: FallbackVideoDecoder fills arena slots from
    the subprocess pipe, the detector sees the rectangle, and the spin
    ends gracefully at EOF (watchdog-reconnect contract)."""
    from watsor_tpu.detection.detector import ObjectDetector
    from watsor_tpu.testing.shapes import (SHAPE_LABELS, ShapeCounter,
                                           ShapeDetectorBackend)

    # paced like a real camera (~66 fps): an unpaced 60-frame burst races
    # the detector thread's scheduling — observed dropping >55 frames on
    # a loaded one-core CI host and starving the 5-count latch
    stub, argv_file = _write_stub(tmp_path, n_frames=150, pace=0.015)
    monkeypatch.setenv('WATSOR_FFMPEG_BIN', stub)

    stop = threading.Event()
    buffer = FrameBuffer(10, W, H, detect_hw=DETECT_HW)
    queues = balanced_queue_group(['cam'], maxsize=2)
    decoder = FallbackVideoDecoder('cam', queues['cam'], buffer,
                                   'camera.mp4', argv=EXOTIC_ARGV,
                                   stop_event=stop)
    detector = ObjectDetector('det', queues['cam'], {'cam': buffer},
                              ShapeDetectorBackend(DETECT_HW),
                              stop_event=stop, max_batch=4)
    counter_queue = Queue(1)
    counter = ShapeCounter('counter', counter_queue, buffer, count=5,
                           stop_event=stop)
    decoder.subscribe(counter_queue)
    for task in (counter, detector, decoder):
        task.start()
    try:
        assert counter.latch.wait(20), 'did not see 5 detected frames'
        assert SHAPE_LABELS['rectangle'] in counter.seen_labels
        deadline = time.time() + 10
        while decoder.is_alive() and time.time() < deadline:
            time.sleep(0.1)
        assert not decoder.is_alive()        # EOF ended the spin...
        assert not decoder.is_shutdown()     # ...but watchdog may restart
        assert json.loads(argv_file.read_text()) == EXOTIC_ARGV[1:]
    finally:
        stop.set()
        for task in (decoder, detector, counter):
            task.join(5)


def test_application_selects_fallback(monkeypatch):
    """main._create_decoder: unknown flags + WATSOR_FFMPEG_FALLBACK=1 ->
    FallbackVideoDecoder; without the env the native decoder is kept and
    the flags are warned-and-dropped as before."""
    from watsor_tpu.io.video import VideoDecoder
    from watsor_tpu.main import Application
    from watsor_tpu.runtime.meters import RateLimiter

    cfg = {'input': 'camera.mp4', 'ffmpeg': {'decoder': list(EXOTIC_ARGV)}}
    buffer = FrameBuffer(4, W, H, detect_hw=DETECT_HW)
    queues = balanced_queue_group(['cam'], maxsize=2)

    monkeypatch.setenv('WATSOR_FFMPEG_FALLBACK', '1')
    dec = Application._create_decoder(None, 'cam', cfg, queues['cam'],
                                      buffer, RateLimiter())
    assert isinstance(dec, FallbackVideoDecoder)

    monkeypatch.delenv('WATSOR_FFMPEG_FALLBACK')
    dec = Application._create_decoder(None, 'cam', cfg, queues['cam'],
                                      buffer, RateLimiter())
    assert isinstance(dec, VideoDecoder)
    assert not isinstance(dec, FallbackVideoDecoder)
