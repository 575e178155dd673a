"""Launcher-surface tests: the ``python -m watsor_tpu`` module entry and
the warm-then-serve launcher ``main_for_tpu`` (the reference's
main_for_gpu contract, /root/reference/watsor/main_for_gpu.py:17-31 —
build/reuse the engine artifact, then run the Application)."""

import os
import subprocess
import sys

import pytest

import watsor_tpu.main
import watsor_tpu.warmup
from watsor_tpu import main_for_tpu


def test_module_entry_help_exits_zero():
    # `python -m watsor_tpu --help` must present the reference CLI surface
    out = subprocess.run(
        [sys.executable, '-m', 'watsor_tpu', '--help'],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr
    for flag in ('--config', '--model-path', '--log-path', '--log-level'):
        assert flag in out.stdout


class _StubApp:
    instances = []

    def __init__(self, args):
        self.args = args
        self.ran = False
        _StubApp.instances.append(self)

    def run(self):
        self.ran = True


@pytest.fixture
def launcher_rig(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setattr(watsor_tpu.warmup, 'main',
                        lambda argv: calls.append(list(argv)))
    monkeypatch.setattr(watsor_tpu.main, 'Application', _StubApp)
    _StubApp.instances = []
    config = tmp_path / 'config.yaml'
    config.write_text('cameras: []\n')
    return calls, str(config)


def test_main_for_tpu_warms_exact_serving_program_then_serves(
        launcher_rig, monkeypatch, tmp_path):
    calls, config = launcher_rig
    cache = str(tmp_path / 'cache')
    monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR', cache)
    main_for_tpu.main(['-c', config, '--model', 'ssd_mobilenet_v1',
                       '--model-path', str(tmp_path)])

    assert len(calls) == 1
    argv = calls[0]
    # warms into the persistent cache the serving process will hit...
    assert argv[argv.index('--cache-dir') + 1] == cache
    # ...for the EXACT serving program: config-derived class axis + model
    assert argv[argv.index('-c') + 1] == config
    assert argv[argv.index('-m') + 1] == 'ssd_mobilenet_v1'
    assert argv[argv.index('--model-path') + 1] == str(tmp_path)
    # then the real Application runs with the original args
    (app,) = _StubApp.instances
    assert app.ran and app.args.config == config


def test_main_for_tpu_serves_even_when_warmup_fails(
        launcher_rig, monkeypatch):
    calls, config = launcher_rig

    def _boom(argv):
        raise RuntimeError('no accelerator')
    monkeypatch.setattr(watsor_tpu.warmup, 'main', _boom)
    main_for_tpu.main(['-c', config])
    # warmup failure must not prevent serving (compiles happen inline)
    (app,) = _StubApp.instances
    assert app.ran


def test_main_for_tpu_omits_model_flag_when_unset(launcher_rig,
                                                  monkeypatch):
    calls, config = launcher_rig
    monkeypatch.delenv('WATSOR_MODEL', raising=False)
    monkeypatch.delenv('MODEL_PATH', raising=False)
    main_for_tpu.main(['-c', config])
    argv = calls[0]
    # no zoo override -> the serving default decides; model-path always
    # rides along (argparse gives it the reference default)
    assert '-m' not in argv
    assert argv[argv.index('--model-path') + 1] == '/usr/share/watsor/model'
