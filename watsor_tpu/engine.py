"""Drop-in shim for the reference's engine-build CLI.

The reference compiles its model offline with
``python -m watsor.engine -i gpu.uff -o gpu.trt -p 16``
(/root/reference/watsor/engine.py:73-107). The TPU-native analog is the
XLA compilation cache warmed by :mod:`watsor_tpu.warmup`; this shim keeps
scripts written against the reference CLI working: the familiar flags are
accepted, ``-i``'s model file stem selects the zoo model when it matches,
``-o``'s directory becomes the cache dir, and the precision flag carries
through.
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Utility to compile the detection model prior to '
                    'inference (reference engine.py compatibility; the '
                    '"engine" is the persistent XLA compilation cache)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('-i', '--input', dest='model_path',
                        metavar='MODEL_PATH',
                        help='model file or zoo name (the UFF/ONNX inputs '
                             'of the reference map to zoo models here)')
    parser.add_argument('-p', '--precision', type=int, choices=[32, 16],
                        default=16, help='float precision (16 = bfloat16)')
    parser.add_argument('-w', '--workspace', default=1024, type=int,
                        help='ignored (XLA manages memory)')
    parser.add_argument('-mw', '--model-width', type=int, default=300,
                        help='ignored (model input size comes from the zoo)')
    parser.add_argument('-mh', '--model-height', type=int, default=300,
                        help='ignored (model input size comes from the zoo)')
    parser.add_argument('-o', '--output', dest='engine_path',
                        default=os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                               '/tmp/watsor-tpu-jit-cache'),
                        help='compilation cache directory (a file path '
                             'uses its parent)')
    args = parser.parse_args(argv)

    from watsor_tpu.models.zoo import MODEL_REGISTRY
    from watsor_tpu.warmup import main as warmup_main

    cache_dir = args.engine_path
    if os.path.splitext(cache_dir)[1]:        # looked like a file path
        cache_dir = os.path.dirname(cache_dir) or '.'

    warmup_args = ['--cache-dir', cache_dir, '-p', str(args.precision)]
    if args.model_path:
        stem = os.path.splitext(os.path.basename(args.model_path))[0]
        if stem in MODEL_REGISTRY:
            warmup_args += ['-m', stem]
        else:
            # a weight-file path: its directory is the model dir
            warmup_args += ['--model-path',
                            os.path.dirname(os.path.abspath(
                                args.model_path))]
    print('Compiling the detection step into the XLA cache at {} '
          '(the TPU analog of the TensorRT engine build).'
          .format(cache_dir))
    warmup_main(warmup_args)


if __name__ == '__main__':
    sys.exit(main())
