"""The AOT-compile CLI (watsor_tpu/warmup.py) — the analog of the
reference's TRT engine build (/root/reference/watsor/engine.py), whose
``-p 32|16`` precision switch must both work (engine.py:25-26)."""

import jax.numpy as jnp
import pytest

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
