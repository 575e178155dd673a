"""Generate the end-to-end golden detection files for every zoo family.

Run on the JAX CPU backend (the backend CI runs on):

    JAX_PLATFORMS=cpu python scripts/make_goldens.py [family ...]

Writes ``tests/data/goldens/<family>.json``: the top detections the full
uint8-photo-in → detections-out pipeline produces on the bundled natural
images with the family's DETERMINISTIC seeded initialization (flax init
under PRNGKey(0) — no weight download needed). ``tests/test_golden_e2e.py``
re-runs the identical pipeline and requires label equality + IoU > 0.5 +
close scores, so any change to resize, normalization, anchors, box
decoding, NMS or label mapping trips the golden.

Regenerate (and review the diff!) only when the pipeline semantics change
on purpose.
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

from watsor_tpu.testing import golden  # noqa: E402

IMAGE_DIR = os.path.join(REPO, 'tests', 'data', 'images')
GOLDEN_DIR = os.path.join(REPO, 'tests', 'data', 'goldens')


def main(argv=None):
    families = (argv if argv else None) or list(golden.GOLDEN_FAMILIES)
    batch, names = golden.load_photo_batch(IMAGE_DIR)
    for family in families:
        print('generating', family, '...', flush=True)
        backend = golden.build_golden_detector(family)
        images = golden.run_golden(backend, batch, names)
        payload = {
            'model': family,
            'backend': 'cpu',
            'dtype': 'float32',
            'init': 'flax init, PRNGKey(0) (build_from_zoo default)',
            'jax': jax.__version__,
            'images': images,
        }
        path = os.path.join(GOLDEN_DIR, family + '.json')
        golden.save_goldens(path, payload)
        counts = {k: len(v) for k, v in images.items()}
        print('  wrote', path, counts, flush=True)


if __name__ == '__main__':
    main(sys.argv[1:])
