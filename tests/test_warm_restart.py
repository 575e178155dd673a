"""Persistent-compilation-cache restart contract (round-5 VERDICT #5):
a process restart with the same cache directory must hit the cache and
make the first detection step much faster than the cold compile — the
TPU analog of the reference skipping the TRT engine build when gpu.trt
exists (/root/reference/watsor/main_for_gpu.py:17-26).

Runs the mechanics on the CPU backend (cache keys include the platform,
so a hit here attests the persistence plumbing; the on-silicon numbers
live in WARM_RESTART.jsonl via scripts/warm_restart.py).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
from time import perf_counter
sys.path.insert(0, %(repo)r)
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', %(cache)r)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import numpy as np
import jax.numpy as jnp
from watsor_tpu.models.ssd import SSDConfig, build_detector
det = build_detector(SSDConfig(num_classes=3, input_size=96,
                               width_multiplier=0.35,
                               extra_features=(32, 32, 32, 32),
                               dtype=jnp.float32))
frames = jnp.asarray(np.zeros((4, 96, 96, 3), np.uint8))
t0 = perf_counter()
jax.block_until_ready(det.detect_batch(det.params, frames))
print('STEP_S', perf_counter() - t0, flush=True)
"""


def _leg(cache_dir):
    code = CHILD % {'repo': REPO, 'cache': cache_dir}
    proc = subprocess.run([sys.executable, '-c', code],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for line in proc.stdout.splitlines():
        if line.startswith('STEP_S'):
            return float(line.split()[1])
    raise AssertionError('no STEP_S in ' + proc.stdout[-500:])


def test_restart_hits_persistent_cache(tmp_path):
    cache = str(tmp_path / 'jit')
    cold_s = _leg(cache)
    entries = sum(len(files) for _, _, files in os.walk(cache))
    assert entries > 0, 'cold compile persisted nothing'
    warm_s = _leg(cache)
    # deserialize is dramatically cheaper than compile; 2x is a loose
    # floor that stays robust under CI load
    assert warm_s < cold_s / 2, (
        'restart did not hit the cache: cold %.2fs, restart %.2fs'
        % (cold_s, warm_s))
