"""Int8-activation SSD inference (models/ssd_int8.py): BN folding is
exact, the quantized forward tracks the float model closely, and the
end-to-end detect contract holds."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax.numpy as jnp

from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.models.ssd_int8 import build_int8_detector, calibrate, \
    fold_unit
from watsor_tpu.ops.preprocess import preprocess_batch

CFG = SSDConfig(num_classes=3, dtype=jnp.float32)


@pytest.fixture(scope='module')
def rigs():
    detector = build_detector(CFG)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (4, 300, 300, 3), np.uint8)
    qdetector = build_int8_detector(detector, calib)
    return detector, qdetector


def test_bn_folding_is_exact():
    """folded conv(x) == BN(conv(x)) in float."""
    rng = np.random.default_rng(1)
    kernel = rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.normal(0, 0.2, 16).astype(np.float32)
    mean = rng.normal(0, 0.5, 16).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    folded_kernel, bias = fold_unit(
        {'Conv_0': {'kernel': kernel},
         'BatchNorm_0': {'scale': gamma, 'bias': beta}},
        {'BatchNorm_0': {'mean': mean, 'var': var}})
    x = rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32)
    import jax
    conv = lambda k: jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    want = (np.asarray(conv(kernel)) - mean) / np.sqrt(var + 1e-3) * \
        gamma + beta
    got = np.asarray(conv(folded_kernel)) + bias
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_calibration_captures_every_unit(rigs):
    detector, _ = rigs
    rng = np.random.default_rng(2)
    absmax = calibrate(detector,
                       rng.integers(0, 255, (2, 300, 300, 3), np.uint8))
    from watsor_tpu.models.ssd_int8 import _unit_paths
    for path in _unit_paths(CFG):
        assert path in absmax, path


def test_quantized_forward_tracks_float(rigs):
    detector, qdetector = rigs
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (2, 300, 300, 3), np.uint8)
    x = preprocess_batch(jnp.asarray(images), 300, 300, dtype=jnp.float32)

    fb, fl = detector.raw_apply(detector.params, x)
    qb, ql = qdetector.raw_apply(qdetector.params, x)

    def cosine(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    assert cosine(fb, qb) > 0.95, cosine(fb, qb)
    assert cosine(fl, ql) > 0.95, cosine(fl, ql)


def test_quantized_detect_batch_contract(rigs):
    _, qdetector = rigs
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.integers(0, 255, (2, 300, 300, 3), np.uint8))
    out = qdetector.detect_batch(qdetector.params, images)
    assert out.boxes.shape == (2, CFG.max_detections, 4)
    assert out.scores.shape == (2, CFG.max_detections)
    assert out.classes.shape == (2, CFG.max_detections)
    assert float(jnp.min(out.boxes)) >= 0.0
    assert float(jnp.max(out.boxes)) <= 1.0
