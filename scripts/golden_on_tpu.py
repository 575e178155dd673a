"""Golden natural-photo accuracy ON THE REAL CHIP.

CI pins the photograph→detections goldens on the CPU backend
(tests/test_golden_e2e.py); this script closes the remaining numerics leg
by running the same harness on TPU hardware:

1. f32 leg: the golden detector (float32 activations, the dtype the
   stored goldens were produced with) must reproduce the stored top
   detections — label equality + IoU > 0.5 + scores within 2e-2 (TPU f32
   convolutions run through the MXU's bf16 passes, so exact-float
   equality with the CPU run is not expected, semantic equality is).
2. bf16 leg: the PRODUCTION serving path (zoo default dtype) must still
   produce the same labels in the same places (IoU > 0.5, scores free) —
   the assertion a camera operator actually relies on.

Run on the chip:

    cd /root/repo && python -u - ssd_mobilenet_v2 efficientdet_lite0 \
        < scripts/golden_on_tpu.py

Appends one JSON line per family to GOLDEN_TPU.jsonl (repo root).
"""

import json
import os
import sys

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

IMAGE_DIR = os.path.join(REPO, 'tests', 'data', 'images')
GOLDEN_DIR = os.path.join(REPO, 'tests', 'data', 'goldens')
DEFAULT = ('ssd_mobilenet_v2', 'efficientdet_lite0')


def run_family(family, batch, names):
    import jax

    from watsor_tpu.detection.backend import JaxDetectorBackend
    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.testing import golden

    stored = golden.load_goldens(
        os.path.join(GOLDEN_DIR, family + '.json'))

    legs = os.environ.get('GOLDEN_LEGS', 'f32,bf16_production').split(',')
    result = {'family': family, 'device': str(jax.devices()[0])}
    for leg, kwargs, score_tol in (
            ('f32', {'dtype': jax.numpy.float32}, 2e-2),
            ('bf16_production', {}, None)):
        if leg not in legs:
            continue
        print('golden_on_tpu: {} {} leg compiling...'.format(family, leg),
              file=sys.stderr, flush=True)
        backend = JaxDetectorBackend(build_from_zoo(family, **kwargs))
        got = golden.run_golden(backend, batch, names, top=20)
        problems = []
        for name in names:
            problems += ['[{}] {}'.format(name, p) for p in
                         golden.match_records(stored['images'][name],
                                              got[name],
                                              score_tol=score_tol)]
        result[leg] = {'ok': not problems, 'problems': problems[:10]}
        print('golden_on_tpu: {} {}: {}'.format(
            family, leg, 'OK' if not problems else problems),
            file=sys.stderr, flush=True)
    return result


def main(argv):
    import jax

    from watsor_tpu.testing import golden

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    assert 'tpu' in str(jax.devices()[0]).lower() or \
        'axon' in jax.default_backend(), \
        'this script must run on the chip: ' + str(jax.devices())

    batch, names = golden.load_photo_batch(IMAGE_DIR)
    out_path = os.path.join(REPO, 'GOLDEN_TPU.jsonl')
    ok = True
    for family in (argv or DEFAULT):
        row = run_family(family, batch, names)
        ok = ok and all(row[leg]['ok'] for leg in
                        ('f32', 'bf16_production') if leg in row)
        with open(out_path, 'a') as f:
            f.write(json.dumps(row) + '\n')
        print(json.dumps(row), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main(sys.argv[1:])
