"""fused vs fused_exact step cost at the PRODUCTION class count.

BENCHMARKS round 2 measured the fused_exact premium (+1.25 ms) at the
worst case C=90; deployments watch 2-5 classes and active-label trimming
shrinks the NMS class axis accordingly — this measures the premium that
configs actually pay. One process, four programs.

timeout 3000 python -u scripts/measure_nms_active.py
"""

import json
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, '/root/repo')

BATCH = 32
STEPS = 20


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    frames = [jax.device_put(rng.randint(0, 255, (BATCH, 300, 300, 3))
                             .astype(np.uint8), device) for _ in range(3)]
    results = {}
    for labels, tag in ((None, 'C90'), ((1, 3), 'C2_person_car')):
        for mode in ('fused', 'fused_exact'):
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
            key = '{}_{}'.format(tag, mode)
            results[key] = {'ms': round(ms, 2),
                            'fps': round(BATCH / ms * 1000.0, 1)}
            print(json.dumps({key: results[key]}), flush=True)
    with open('/tmp/nms_active_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
