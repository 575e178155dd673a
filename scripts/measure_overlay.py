"""Measure the batched device overlay kernel (ops/overlay.py) on the chip:
frames/s of box rendering at 1080p across a camera micro-batch — the
device-render path behind WATSOR_DEVICE_RENDER=1 (item: validate under
load, then pick the default).

Usage: python scripts/measure_overlay.py [batch] [height] [width]
"""

import json
import sys
from time import perf_counter

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    import jax
    import jax.numpy as jnp

    from watsor_tpu.ops.overlay import render_detections
    from watsor_tpu.runtime.frames import MAX_DETECTIONS

    rng = np.random.RandomState(0)
    device = jax.devices()[0]
    images = jax.device_put(
        rng.randint(0, 255, (batch, h, w, 3), np.uint8), device)
    n_boxes = 8
    boxes = np.zeros((batch, MAX_DETECTIONS, 4), np.float32)
    classes = np.zeros((batch, MAX_DETECTIONS), np.int32)
    boxes[:, :n_boxes] = rng.uniform(0, 1, (batch, n_boxes, 4))
    boxes[:, :n_boxes, 2:] = boxes[:, :n_boxes, :2] + 0.2
    boxes[:, :n_boxes] *= np.array([h, w, h, w], np.float32)
    classes[:, :n_boxes] = rng.randint(1, 10, (batch, n_boxes))
    boxes = jax.device_put(jnp.asarray(boxes), device)
    classes = jax.device_put(jnp.asarray(classes), device)

    print('compiling overlay b{} {}x{}'.format(batch, h, w),
          file=sys.stderr, flush=True)
    t0 = perf_counter()
    jax.block_until_ready(render_detections(images, boxes, classes))
    print('compiled in {:.1f}s'.format(perf_counter() - t0),
          file=sys.stderr, flush=True)

    steps = 20
    t0 = perf_counter()
    outs = [render_detections(images, boxes, classes) for _ in range(steps)]
    jax.block_until_ready(outs[-1])
    elapsed = perf_counter() - t0
    print(json.dumps({
        'kernel': 'device overlay render',
        'batch': batch, 'resolution': '{}x{}'.format(w, h),
        'ms_per_step': round(elapsed / steps * 1000.0, 2),
        'frames_per_s': round(batch * steps / elapsed, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
