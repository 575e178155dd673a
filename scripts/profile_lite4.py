"""Stage decomposition of the EfficientDet-Lite4 (640²) fused step on the
chip: where do the 68 ms/batch-32 go? (VERDICT round-2 item #2.)

Stages are separately jitted and dispatched back-to-back against
device-resident inputs (same method as the round-2 SSD decomposition in
BENCHMARKS.md). Select stages by argv to keep one compile per process:

    cd /root/repo && python -u - full forward post pre < scripts/profile_lite4.py

Env: LITE_VARIANT=lite4 (default), BENCH_BATCH=32, BENCH_STEPS=10.
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
STEPS = int(os.environ.get('BENCH_STEPS', 10))
VARIANT = os.environ.get('LITE_VARIANT', 'lite4')


def _time(step, *args):
    import jax
    t0 = perf_counter()
    jax.block_until_ready(step(*args))
    compile_s = perf_counter() - t0
    t0 = perf_counter()
    outs = [step(*args) for _ in range(STEPS)]
    jax.block_until_ready(outs[-1])
    ms = (perf_counter() - t0) * 1000.0 / STEPS
    return ms, compile_s


def main(argv):
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.roofline import roofline_row, step_cost

    stages = argv or ['full', 'forward', 'post', 'pre']
    device = jax.devices()[0]
    det = build_from_zoo('efficientdet_' + VARIANT)
    cfg = det.config
    size = cfg.input_size
    params = jax.device_put(det.params, device)
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 255, (BATCH, size, size, 3), np.uint8), device)
    A = det.anchors.shape[0]
    C = len(cfg.active_labels) if cfg.active_labels else cfg.num_classes
    print('variant={} anchors={} classes={} size={}'.format(
        VARIANT, A, C, size), file=sys.stderr, flush=True)

    results = {'variant': VARIANT, 'batch': BATCH, 'anchors': A}

    if 'full' in stages:
        ms, comp = _time(det.detect_batch, params, frames)
        flops, hbm = step_cost(det.detect_batch, params, frames)
        results['full'] = roofline_row('full_step', BATCH, ms, flops, hbm,
                                       device)
        print('full: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
              file=sys.stderr, flush=True)

    if 'forward' in stages or 'pre' in stages:
        from watsor_tpu.ops.preprocess import resize_bilinear_mxu

        def normalize(x):
            return ((x - cfg.mean_rgb) / cfg.stddev_rgb).astype(cfg.dtype)

        if 'pre' in stages:
            @jax.jit
            def pre_only(images_u8):
                x = resize_bilinear_mxu(images_u8, size, size,
                                        dtype=jnp.float32)
                return normalize(x)
            ms, comp = _time(pre_only, frames)
            results['pre'] = {'ms_per_step': round(ms, 3)}
            print('pre: {:.2f} ms'.format(ms), file=sys.stderr, flush=True)

        if 'forward' in stages:
            @jax.jit
            def fwd(p, images_u8):
                x = resize_bilinear_mxu(images_u8, size, size,
                                        dtype=jnp.float32)
                return det.raw_apply(p, normalize(x))
            ms, comp = _time(fwd, params, frames)
            flops, hbm = step_cost(fwd, params, frames)
            results['forward'] = roofline_row('pre+forward', BATCH, ms,
                                              flops, hbm, device)
            print('pre+forward: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
                  file=sys.stderr, flush=True)

    if 'post' in stages:
        from watsor_tpu.models.ssd import make_detect_batch
        from watsor_tpu.ops.boxes import decode_boxes
        from watsor_tpu.ops.nms import batched_class_aware_nms

        anchors_dev = jnp.asarray(det.anchors)
        box_enc = jax.device_put(
            rng.uniform(-1, 1, (BATCH, A, 4)).astype(np.float32), device)
        logits = jax.device_put(
            jnp.asarray(rng.uniform(-6, 1, (BATCH, A, C)).astype(
                np.float32)).astype(jnp.bfloat16), device)  # production dtype

        # the exact post program production runs (make_detect_batch):
        # fused modes take the late-materialization path (union by raw
        # max logit, decode+sigmoid only the M survivors)
        from watsor_tpu.ops.nms import batched_class_aware_nms_fused_late
        fused_suppression = {'fused': 'fast', 'fused_exact': 'greedy',
                             'fused_exact_pallas': 'greedy_pallas'} \
            .get(cfg.nms_mode)

        @jax.jit
        def post(box_enc, logits):
            if fused_suppression is not None:
                return batched_class_aware_nms_fused_late(
                    box_enc, logits, anchors_dev,
                    scales=tuple(cfg.box_coder_scales),
                    iou_threshold=cfg.iou_threshold,
                    score_threshold=cfg.score_threshold,
                    max_detections=cfg.max_detections,
                    suppression=fused_suppression)
            boxes = decode_boxes(box_enc, anchors_dev,
                                 scales=cfg.box_coder_scales)
            scores = jax.nn.sigmoid(logits)
            return batched_class_aware_nms(
                boxes, scores, iou_threshold=cfg.iou_threshold,
                score_threshold=cfg.score_threshold,
                max_detections=cfg.max_detections, mode=cfg.nms_mode)
        ms, comp = _time(post, box_enc, logits)
        flops, hbm = step_cost(post, box_enc, logits)
        results['post'] = roofline_row('decode+nms', BATCH, ms, flops, hbm,
                                       device)
        print('decode+nms: {:.2f} ms (compile {:.0f}s)'.format(ms, comp),
              file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)
    with open(os.path.join(REPO, 'LITE4_PROFILE.jsonl'), 'a') as f:
        f.write(json.dumps(results) + '\n')


if __name__ == '__main__':
    main(sys.argv[1:])
