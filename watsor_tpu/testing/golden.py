"""End-to-end golden-accuracy harness helpers.

The reference inherits detection quality by running published model
binaries verbatim (/root/reference/watsor/detection/tensorflow_cpu.py:94-121);
the rebuild's conversion chain is proven numerically, but numeric parity
alone once missed a geometry bug (anchors clobbered by a config override)
that only a REAL end-to-end detect could catch. This module closes that
loop: run the full uint8-photograph-in → detections-out pipeline on bundled
natural JPEGs and pin the result against stored goldens — labels must
match and boxes must overlap IoU > 0.5.

Used by ``tests/test_golden_e2e.py`` (assertions) and
``scripts/make_goldens.py`` (golden generation); both must go through the
same code path so a pipeline change shows up as a golden mismatch, never
as harness skew.
"""

import json
import os

import numpy as np

DEFAULT_IMAGES = ('grace_hopper.jpg', 'china.jpg', 'flower.jpg')

# every zoo family with public-checkpoint conversion support
GOLDEN_FAMILIES = (
    'ssd_mobilenet_v1',
    'ssd_mobilenet_v2',
    'ssdlite_mobilenet_v2',
    'ssd_inception_v2',
    'efficientdet_lite0',
    'efficientdet_lite1',
    'efficientdet_lite2',
    'efficientdet_lite3',
    'efficientdet_lite4',
)


def load_photo_batch(image_dir, names=DEFAULT_IMAGES):
    """Decode the bundled JPEGs into ONE zero-padded uint8 canvas batch.

    A batch must have a single static resolution (XLA), so each photo is
    placed top-left on a canvas sized to the largest image; the padding is
    black. Returns (batch [B, H, W, 3] uint8, names)."""
    from PIL import Image

    arrays = []
    for name in names:
        with Image.open(os.path.join(image_dir, name)) as im:
            arrays.append(np.asarray(im.convert('RGB'), np.uint8))
    h = max(a.shape[0] for a in arrays)
    w = max(a.shape[1] for a in arrays)
    batch = np.zeros((len(arrays), h, w, 3), np.uint8)
    for i, a in enumerate(arrays):
        batch[i, :a.shape[0], :a.shape[1]] = a
    return batch, list(names)


def build_golden_detector(model_name, model_path=None):
    """The ONE way goldens are produced and checked: float32 activations
    (so XLA fusion-order changes don't shuffle near-tie rankings the way
    bfloat16 rounding would) and the model's default NMS mode (the
    production path)."""
    import jax.numpy as jnp

    from watsor_tpu.detection.backend import JaxDetectorBackend
    from watsor_tpu.models.zoo import build_from_zoo

    detector = build_from_zoo(model_name, model_path, dtype=jnp.float32)
    return JaxDetectorBackend(detector)


def detections_to_records(boxes, scores, classes, valid, top=8,
                          score_floor=0.0):
    """Per-image list of {label, score, box} for the top-k detections."""
    records = []
    for i in range(boxes.shape[0]):
        n = int(valid[i])
        rows = [r for r in range(n) if scores[i, r] > score_floor]
        rows.sort(key=lambda r: -float(scores[i, r]))
        records.append([
            {'label': int(classes[i, r]),
             'score': round(float(scores[i, r]), 6),
             'box': [round(float(v), 6) for v in boxes[i, r]]}
            for r in rows[:top]])
    return records


def run_golden(backend, batch, names, top=8, score_floor=0.0):
    boxes, scores, classes, valid, _ = backend.detect_batch(batch)[:5]
    records = detections_to_records(boxes, scores, classes, valid,
                                    top=top, score_floor=score_floor)
    return dict(zip(names, records))


def iou(a, b):
    """IoU of two [ymin, xmin, ymax, xmax] boxes."""
    yi0, xi0 = max(a[0], b[0]), max(a[1], b[1])
    yi1, xi1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, yi1 - yi0) * max(0.0, xi1 - xi0)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def match_records(expected, got, iou_threshold=0.5, score_tol=5e-3):
    """Every expected detection must have a counterpart in ``got`` with the
    same label, IoU above threshold, and a close score. Returns a list of
    human-readable mismatch strings (empty = pass)."""
    problems = []
    for e in expected:
        candidates = [g for g in got if g['label'] == e['label']
                      and iou(e['box'], g['box']) > iou_threshold]
        if not candidates:
            problems.append(
                'no detection matches label={} box={} (have {})'.format(
                    e['label'], e['box'],
                    [(g['label'], [round(v, 3) for v in g['box']])
                     for g in got]))
            continue
        best = min(candidates, key=lambda g: abs(g['score'] - e['score']))
        if score_tol is not None and \
                abs(best['score'] - e['score']) > score_tol:
            problems.append(
                'score drift for label={}: expected {} got {}'.format(
                    e['label'], e['score'], best['score']))
    return problems


def load_goldens(path):
    with open(path) as f:
        return json.load(f)


def save_goldens(path, payload):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write('\n')
