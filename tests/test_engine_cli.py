"""Engine-build CLI shim: the reference's
``python -m watsor.engine -i gpu.uff -o gpu.trt -p 16`` contract
(/root/reference/watsor/engine.py:73-107) maps onto warming the XLA
compilation cache. Drives the real argv plumbing with the warmup
entrypoint stubbed (the compile itself is pinned by
tests/test_warm_restart.py and the slow warmup tests)."""

import pytest

from watsor_tpu import engine
from watsor_tpu.models import zoo


@pytest.fixture()
def warmup_calls(monkeypatch):
    calls = []
    monkeypatch.setattr('watsor_tpu.warmup.main',
                        lambda argv: calls.append(list(argv)))
    return calls


def _opt(argv, flag):
    return argv[argv.index(flag) + 1]


def test_engine_maps_trt_flags_to_cache_warmup(warmup_calls, tmp_path):
    # the reference's exact invocation shape: -i model file, -o engine
    # FILE (its parent becomes the cache dir), -p precision
    engine.main(['-i', 'detector.uff', '-o',
                 str(tmp_path / 'gpu.trt'), '-p', '32'])
    (argv,) = warmup_calls
    assert _opt(argv, '--cache-dir') == str(tmp_path)
    assert _opt(argv, '-p') == '32'
    # 'detector' is not a zoo name -> treated as a weight file; its
    # directory becomes the model dir
    assert '--model-path' in argv


def test_engine_zoo_stem_selects_model(warmup_calls, tmp_path):
    name = sorted(zoo.MODEL_REGISTRY)[0]
    engine.main(['-i', name + '.tflite', '-o', str(tmp_path / 'out')])
    (argv,) = warmup_calls
    assert _opt(argv, '-m') == name
    assert _opt(argv, '-p') == '16'          # default precision
    # no extension on -o: used as the cache dir directly
    assert _opt(argv, '--cache-dir') == str(tmp_path / 'out')


def test_engine_ignored_reference_flags_accepted(warmup_calls, tmp_path):
    # -w/-mw/-mh exist in the reference CLI; the shim must accept them
    engine.main(['-w', '2048', '-mw', '300', '-mh', '300',
                 '-o', str(tmp_path / 'cache')])
    (argv,) = warmup_calls
    assert '-m' not in argv and '--model-path' not in argv
