"""Ahead-of-time compile CLI: warm (and persist) the XLA compilation cache.

The reference compiles its model offline into a TensorRT engine
(/root/reference/watsor/engine.py + main_for_gpu.py:17-26, skipping the
build when ``gpu.trt`` already exists, with FP32/FP16 selected by
``TRT_FLOAT_PRECISION``). The TPU-native analog is jit compilation: this
tool traces the fused detection step for every batch bucket the runtime
uses and persists the compiled executables in JAX's compilation cache, so
production startup pays ~0 compile time.

    python -m watsor_tpu.warmup [-m MODEL] [--model-path DIR]
                                [--cache-dir DIR] [-b 1 2 4 8 16 32]
                                [-p {32,16}]

Precision: ``-p 16`` (default, matching TPU-native bf16) or ``-p 32``; the
``TRT_FLOAT_PRECISION`` env var is honored for drop-in compatibility.
"""

import argparse
import os
from time import perf_counter

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description='Precompile the detection '
                                                 'step into the XLA cache')
    parser.add_argument('-m', '--model', default=None,
                        help='model name from the zoo (default flagship)')
    parser.add_argument('-c', '--config', default=None,
                        help='application YAML: warm the EXACT serving '
                             'program (watched-class axis + nms mode)')
    parser.add_argument('--model-path', default=os.environ.get('MODEL_PATH'),
                        help='directory with model weights')
    parser.add_argument('--cache-dir',
                        default=os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                               '/tmp/watsor-tpu-jit-cache'),
                        help='persistent compilation cache directory')
    parser.add_argument('-b', '--batches', type=int, nargs='+',
                        default=[1, 2, 4, 8, 16, 32, 64],
                        help='batch buckets to compile (must cover the '
                             'serving max_batch, default 64)')
    parser.add_argument('-p', '--precision', type=int,
                        choices=(16, 32),
                        default=int(os.environ.get('TRT_FLOAT_PRECISION',
                                                   16)),
                        help='activation precision (16 = bfloat16)')
    args = parser.parse_args(argv)

    import jax
    jax.config.update('jax_compilation_cache_dir', args.cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    import jax.numpy as jnp
    from watsor_tpu.models.zoo import DEFAULT_MODEL, build_from_zoo

    name = args.model or DEFAULT_MODEL
    active_labels = None
    nms_mode = None
    if args.config:
        import os as _os
        from watsor_tpu.config import normalize, parse, validate
        from watsor_tpu.main import detector_spec_from_config
        config = normalize(validate(parse(args.config)),
                           _os.path.dirname(_os.path.abspath(args.config)))
        name, active_labels, nms_mode = detector_spec_from_config(
            config, args)
        # trim buckets to what this deployment can plausibly produce.
        # A camera CAN contribute more than one frame to a batch (its
        # queue quota releases on get() and the detector's gather window
        # stays open a few ms), so allow 2x headroom over the camera
        # count, rounded up to the runtime's bucket sizes — compiling
        # bucket 64 for a 3-camera config would still waste minutes.
        from watsor_tpu.detection.backend import _bucket
        n_cameras = len(config['cameras'])
        need = _bucket(min(max(2 * n_cameras, 1), max(args.batches)))
        args.batches = sorted({b for b in args.batches if b <= need}
                              | {need})
    dtype = jnp.float32 if args.precision == 32 else None
    detector = build_from_zoo(name, args.model_path, dtype=dtype,
                              active_labels=active_labels,
                              nms_mode=nms_mode)

    size = detector.config.input_size
    for batch in args.batches:
        frames = jnp.asarray(np.zeros((batch, size, size, 3), np.uint8))
        start = perf_counter()
        jax.block_until_ready(detector.detect_batch(detector.params, frames))
        print('batch {:3d}: compiled+ran in {:6.1f} s'.format(
            batch, perf_counter() - start))
    print('Compilation cache persisted under', args.cache_dir)


if __name__ == '__main__':
    main()
