"""fused_exact step cost: XLA while_loop vs the VMEM-resident Pallas
fixed-point kernel (nms_mode='fused_exact_pallas' — a STATIC jit arg, so
the two legs compile distinct executables; the earlier env-flag design
was frozen into the jit cache and measured XLA twice), at C=90 and C=2.

timeout 3000 python -u scripts/measure_nms_kernel.py
"""

import json
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, '/root/repo')

BATCH, STEPS = 32, 20


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    frames = [jax.device_put(rng.randint(0, 255, (BATCH, 300, 300, 3))
                             .astype(np.uint8), device) for _ in range(3)]
    results = {}
    for labels, tag in ((None, 'C90'), ((1, 3), 'C2')):
        for mode in ('fused_exact', 'fused_exact_pallas'):
            det = build_detector(SSDConfig(nms_mode=mode,
                                           active_labels=labels))
            params = jax.device_put(det.params, device)
            jax.block_until_ready(det.detect_batch(params, frames[0]))
            outs = []
            t = perf_counter()
            for i in range(STEPS):
                outs.append(det.detect_batch(params, frames[i % 3]))
            jax.block_until_ready(outs[-1])
            ms = (perf_counter() - t) / STEPS * 1000.0
            key = '{}_{}'.format(tag, 'pallas' if 'pallas' in mode
                                 else 'xla')
            results[key] = {'ms': round(ms, 2),
                            'fps': round(BATCH / ms * 1000.0, 1)}
            print(json.dumps({key: results[key]}), flush=True)
    # sanity: same detections both ways (C2); distinct static modes =
    # distinct executables
    d0 = build_detector(SSDConfig(nms_mode='fused_exact',
                                  active_labels=(1, 3)))
    d1 = build_detector(SSDConfig(nms_mode='fused_exact_pallas',
                                  active_labels=(1, 3)))
    p = jax.device_put(d0.params, device)
    a = jax.device_get(d0.detect_batch(p, frames[0]))
    b = jax.device_get(d1.detect_batch(p, frames[0]))
    same = bool(np.array_equal(np.asarray(a.scores), np.asarray(b.scores)))
    results['detections_identical'] = same
    print(json.dumps({'detections_identical': same}), flush=True)
    with open('/tmp/nms_kernel_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
