"""Launcher that compiles ahead of serving, then runs the application.

Drop-in parity with the reference's GPU launcher
(/root/reference/watsor/main_for_gpu.py: build the TRT engine if missing,
then run): here the "engine build" is warming the persistent XLA
compilation cache for the configured model's batch buckets, so the first
camera frame hits a hot executable.

    python -m watsor_tpu.main_for_tpu --config config.yaml [...]
"""

import logging
import os
import sys

_LOGGER = logging.getLogger(__name__)


def main(argv=None):
    from watsor_tpu.main import Application, _parse_commandline_arguments
    from watsor_tpu.warmup import main as warmup_main

    args = _parse_commandline_arguments(argv)
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               '/tmp/watsor-tpu-jit-cache')
    # warm the EXACT serving program: same config-derived class axis and
    # NMS mode (a generic warm would compile a different executable and
    # miss the cache at startup)
    warmup_args = ['--cache-dir', cache_dir, '-c', args.config]
    if args.model:
        warmup_args += ['-m', args.model]
    if args.model_path:
        warmup_args += ['--model-path', args.model_path]
    try:
        warmup_main(warmup_args)
    except Exception:
        _LOGGER.exception('Warmup failed; continuing (compiles will happen '
                          'on the serving path)')
    Application(args).run()


if __name__ == '__main__':
    sys.exit(main())
