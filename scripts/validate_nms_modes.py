"""Re-pin the NMS-mode cost table (BENCHMARKS.md "NMS semantics vs
cost") with the hardened chained harness (watsor_tpu/timing.py).

The original table was measured with back-to-back dispatch loops, which
the tunnel's early-readiness/replay artifacts can only make look
FASTER — so the "exact loses" ordering was already robust — but the
absolute per-mode costs and the fused_exact premium quoted in README
deserve tamper-proof numbers.

    cd /root/repo && timeout 2400 python -u - < scripts/validate_nms_modes.py

Env: NMS_MODES=fused,fused_exact,exact BENCH_BATCH=32
"""

import json
import os
import sys

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BATCH = int(os.environ.get('BENCH_BATCH', 32))
MODES = os.environ.get('NMS_MODES', 'fused,fused_exact,exact').split(',')


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.ssd import SSDConfig, build_detector
    from watsor_tpu.timing import chained_step_ms, chained_model_runner

    device = jax.devices()[0]
    out = {'batch': BATCH, 'harness': 'chained+fresh-seed', 'probe':
           'nms_modes_ssd300', 'modes': {}}

    for mode in MODES:
        det = build_detector(SSDConfig(nms_mode=mode))
        params = jax.device_put(det.params, device)
        ms, detail = chained_step_ms(
            chained_model_runner(det.detect_batch, params, BATCH,
                                 det.config.input_size),
            log=lambda m: print('%s %s' % (mode, m), file=sys.stderr,
                                flush=True))
        row = {'chained_ms_per_step': round(ms, 2),
               'fps': round(BATCH * 1000.0 / ms, 1)}
        row.update(detail)
        out['modes'][mode] = row
        print(mode, json.dumps(row), file=sys.stderr, flush=True)
        with open(os.path.join(REPO, 'TIMING_VALIDATION.jsonl'), 'a') as fh:
            fh.write(json.dumps({'batch': BATCH,
                                 'harness': 'chained+fresh-seed',
                                 'probe': 'nms_mode', 'mode': mode,
                                 **row}) + '\n')

    print(json.dumps(out), flush=True)


main()
