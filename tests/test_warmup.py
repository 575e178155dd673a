"""The AOT-compile CLI (watsor_tpu/warmup.py) — the analog of the
reference's TRT engine build (/root/reference/watsor/engine.py), whose
``-p 32|16`` precision switch must both work (engine.py:25-26)."""

import jax.numpy as jnp
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


from watsor_tpu.models import zoo
from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.models.zoo import build_from_zoo
from watsor_tpu import warmup

_TINY = SSDConfig(num_classes=2, input_size=96, width_multiplier=0.35)


@pytest.fixture
def tiny_model(monkeypatch):
    monkeypatch.setitem(zoo.MODEL_REGISTRY, '_tiny_warmup',
                        (build_detector, _TINY))
    return '_tiny_warmup'


def test_build_from_zoo_dtype_override():
    det = build_from_zoo('ssd_mobilenet_v2_shapes', dtype=jnp.float32)
    assert det.config.dtype == jnp.float32
    det = build_from_zoo('ssd_mobilenet_v2_shapes')
    assert det.config.dtype == jnp.bfloat16


def test_build_from_zoo_nms_mode_override():
    det = build_from_zoo('ssd_mobilenet_v2_shapes', nms_mode='exact')
    assert det.config.nms_mode == 'exact'


@pytest.mark.parametrize('precision', ['16', '32'])
def test_warmup_both_precisions(tiny_model, tmp_path, precision):
    warmup.main(['-m', tiny_model, '-b', '1',
                 '--cache-dir', str(tmp_path / 'cache'),
                 '-p', precision])


def test_warmup_honors_trt_float_precision_env(tiny_model, tmp_path,
                                               monkeypatch):
    monkeypatch.setenv('TRT_FLOAT_PRECISION', '32')
    warmup.main(['-m', tiny_model, '-b', '1',
                 '--cache-dir', str(tmp_path / 'cache')])


def test_warmup_from_config_matches_serving_program(tiny_model, tmp_path,
                                                    capsys):
    """--config derives the exact serving spec (watched-class axis + NMS
    mode) so the AOT compile hits the cache at startup; batch buckets trim
    to what the camera count can produce (<=1 in-flight frame/camera)."""
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(
        'nms: exact\n'
        'cameras:\n'
        '  - cam1:\n'
        '      width: 64\n'
        '      height: 48\n'
        '      input: synthetic://shapes\n'
        '      detect: [person: , car: ]\n'
        '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n')
    warmup.main(['-m', tiny_model, '-c', str(config_file),
                 '--cache-dir', str(tmp_path / 'cache')])
    printed = capsys.readouterr().out
    # one camera: buckets 1 and 2 (a camera can contribute two frames to
    # one batch via the gather window), but never 4+
    assert 'batch   1:' in printed
    assert 'batch   2:' in printed
    assert 'batch   4:' not in printed, \
        'one camera can never need bucket 4 — buckets not trimmed'

    # the spec the app derives must agree with what warmup used
    import argparse
    from watsor_tpu.config import parse, validate, normalize
    from watsor_tpu.main import detector_spec_from_config
    config = normalize(validate(parse(str(config_file))), str(tmp_path))
    name, labels, nms = detector_spec_from_config(
        config, argparse.Namespace(model=tiny_model))
    assert name == tiny_model
    assert labels == {1, 3}          # person, car
    assert nms == 'exact'


def test_engine_cli_shim(tiny_model, tmp_path):
    """python -m watsor_tpu.engine — the reference engine.py CLI surface
    (/root/reference/watsor/engine.py:73-107) maps onto the warmup."""
    from watsor_tpu import engine
    engine.main(['-i', '{}.msgpack'.format(tiny_model), '-p', '16',
                 '-o', str(tmp_path / 'cache')])
