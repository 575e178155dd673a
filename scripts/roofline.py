"""The 9-model roofline table: XLA cost analysis x measured step time ->
achieved TFLOP/s, GB/s, % of peak, % of speed-of-light per zoo model.

Run on the chip (one compile per invocation is kindest to the tunnel):

    cd /root/repo && python -u - ssd_mobilenet_v2 < scripts/roofline.py

or several models in one process:

    python scripts/roofline.py ssd_mobilenet_v2 efficientdet_lite0

Appends one JSON line per model to ROOFLINE.jsonl (repo root).
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BATCH = int(os.environ.get('BENCH_BATCH', 32))
STEPS = int(os.environ.get('BENCH_STEPS', 20))

ALL = ('ssd_mobilenet_v1', 'ssd_mobilenet_v2', 'ssdlite_mobilenet_v2',
       'ssd_inception_v2', 'efficientdet_lite0', 'efficientdet_lite1',
       'efficientdet_lite2', 'efficientdet_lite3', 'efficientdet_lite4')


def measure(name):
    import jax

    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.roofline import roofline_row, step_cost

    device = jax.devices()[0]
    detector = build_from_zoo(name)
    params = jax.device_put(detector.params, device)
    size = detector.config.input_size
    rng = np.random.RandomState(0)
    buffers = [jax.device_put(
        rng.randint(0, 255, (BATCH, size, size, 3), np.uint8), device)
        for _ in range(2)]

    print('roofline: compiling {} batch-{} ({}x{}) on {}'.format(
        name, BATCH, size, size, device), file=sys.stderr, flush=True)
    step = detector.detect_batch
    t0 = perf_counter()
    jax.block_until_ready(step(params, buffers[0]))
    print('roofline: warm in {:.0f}s'.format(perf_counter() - t0),
          file=sys.stderr, flush=True)

    t0 = perf_counter()
    outs = [step(params, buffers[i % 2]) for i in range(STEPS)]
    jax.block_until_ready(outs[-1])
    ms = (perf_counter() - t0) * 1000.0 / STEPS

    flops, hbm_bytes = step_cost(step, params, buffers[0])
    row = roofline_row(name, BATCH, ms, flops, hbm_bytes, device)
    row['device'] = str(getattr(device, 'device_kind', device))
    return row


def main(argv):
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                           os.path.join(REPO, '.jit_cache'))
    import jax
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    out_path = os.path.join(REPO, 'ROOFLINE.jsonl')
    for name in (argv or ALL):
        row = measure(name)
        line = json.dumps(row)
        print(line, flush=True)
        with open(out_path, 'a') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main(sys.argv[1:])
