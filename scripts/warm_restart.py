"""Warm-restart measurement (round-5 VERDICT #5): cold compile vs
process-restart with the persistent XLA compilation cache — the TPU
analog of the reference's offline TRT engine reuse
(/root/reference/watsor/main_for_gpu.py:17-26, which skips the engine
build when gpu.trt exists).

Runs the SAME single-bucket warmup (flagship SSD, batch 32, bf16) in two
child processes sharing one cache directory:

  leg "cold"     empty cache dir -> full trace + XLA compile
  leg "restart"  same cache dir  -> trace + cache deserialize only

and reports both wall times to WARM_RESTART.jsonl. Each leg is its own
process (one compile per process, the rig's rule); the parent never
imports jax.

Usage: cd /root/repo && timeout 1200 python -u scripts/warm_restart.py
Env: WARM_RESTART_BATCH (default 32), WARM_RESTART_MODEL (default zoo
flagship), WARM_RESTART_PLATFORM (force cpu for mechanics-only runs).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
from time import perf_counter

BATCH = int(os.environ.get('WARM_RESTART_BATCH', 32))
MODEL = os.environ.get('WARM_RESTART_MODEL', '')

CHILD = r"""
import os, sys
from time import perf_counter
sys.path.insert(0, {repo!r})
import jax
if {platform!r}:
    jax.config.update('jax_platforms', {platform!r})
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import numpy as np
import jax.numpy as jnp
from watsor_tpu.models.zoo import DEFAULT_MODEL, build_from_zoo
name = {model!r} or DEFAULT_MODEL
t0 = perf_counter()
det = build_from_zoo(name, None)
build_s = perf_counter() - t0
frames = jnp.asarray(np.zeros(({batch}, det.config.input_size,
                               det.config.input_size, 3), np.uint8))
t0 = perf_counter()
jax.block_until_ready(det.detect_batch(det.params, frames))
print('RESULT', build_s, perf_counter() - t0, flush=True)
"""


def run_leg(cache_dir, platform):
    code = CHILD.format(repo=os.getcwd(), cache=cache_dir, batch=BATCH,
                        model=MODEL, platform=platform)
    t0 = perf_counter()
    proc = subprocess.run([sys.executable, '-u', '-c', code],
                          capture_output=True, text=True, timeout=900)
    wall = perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError('leg failed: %s' % proc.stderr[-2000:])
    for line in proc.stdout.splitlines():
        if line.startswith('RESULT'):
            _, build_s, compile_s = line.split()
            return {'process_wall_s': round(wall, 1),
                    'model_build_s': round(float(build_s), 1),
                    'first_step_s': round(float(compile_s), 1)}
    raise RuntimeError('no RESULT line in: %s' % proc.stdout[-2000:])


def main():
    platform = os.environ.get('WARM_RESTART_PLATFORM', '')
    cache_dir = tempfile.mkdtemp(prefix='watsor_warm_restart_')
    try:
        print('warm_restart: cold leg (empty cache %s)' % cache_dir,
              file=sys.stderr, flush=True)
        cold = run_leg(cache_dir, platform)
        n_entries = sum(len(files) for _, _, files in os.walk(cache_dir))
        print('warm_restart: cache has %d entries; restart leg'
              % n_entries, file=sys.stderr, flush=True)
        warm = run_leg(cache_dir, platform)
        rec = {
            'metric': 'warm restart: first detection step wall time, '
                      'cold XLA compile vs persistent-cache process '
                      'restart',
            'model': MODEL or 'zoo default', 'batch': BATCH,
            'platform': platform or 'default accelerator',
            'cold': cold, 'restart': warm,
            'cache_entries': n_entries,
            'speedup_first_step': round(
                cold['first_step_s'] / max(warm['first_step_s'], 1e-9), 1),
            'cache_hit': warm['first_step_s'] < 0.5 * cold['first_step_s'],
        }
        with open('WARM_RESTART.jsonl', 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(json.dumps(rec))
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == '__main__':
    main()
