"""Re-pin the production-config number (1080p ingest + fused_exact +
active C=2, batch 16 — BENCHMARKS.md headline table) with the hardened
chained harness (watsor_tpu/timing.py).

    cd /root/repo && timeout 2400 python -u - < scripts/validate_production_1080p.py
"""

import json
import os
import sys

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BATCH = int(os.environ.get('BENCH_BATCH', 16))


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.ssd import SSDConfig, build_detector
    from watsor_tpu.timing import chained_step_ms, chained_model_runner

    det = build_detector(SSDConfig(nms_mode='fused_exact',
                                   active_labels=(1, 3)))
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)

    ms, detail = chained_step_ms(
        chained_model_runner(det.detect_batch, params, BATCH, (1080, 1920)),
        log=lambda m: print('production_1080p %s' % m, file=sys.stderr,
                            flush=True))
    row = {'batch': BATCH, 'harness': 'chained+fresh-seed',
           'probe': 'production_1080p_fused_exact_c2',
           'chained_ms_per_step': round(ms, 2),
           'fps': round(BATCH * 1000.0 / ms, 1)}
    row.update(detail)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, 'TIMING_VALIDATION.jsonl'), 'a') as fh:
        fh.write(json.dumps(row) + '\n')


main()
