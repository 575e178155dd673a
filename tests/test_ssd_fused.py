"""Fused inverted-residual walk (models/ssd_fused.py + ops/fused_block.py,
interpret mode on CPU): the folded-BN float walk with Pallas blocks must
reproduce the flax model. On-chip it measured SLOWER than XLA's conv
pipeline (BENCHMARKS.md), so it ships as an opt-in experiment — but it
must stay correct."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax.numpy as jnp

from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.models.ssd_fused import build_fused_detector
from watsor_tpu.ops.preprocess import preprocess_batch

CFG = SSDConfig(num_classes=3, input_size=96, dtype=jnp.float32)


def test_fused_walk_matches_flax_model():
    detector = build_detector(CFG)
    fused = build_fused_detector(detector)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 96, 96, 3), np.uint8)
    x = preprocess_batch(jnp.asarray(images), 96, 96, dtype=jnp.float32)

    fb, fl = detector.raw_apply(detector.params, x)
    gb, gl = fused.raw_apply(fused.params, x)
    # the fused path computes in bf16 (like the production bf16 config);
    # against the fp32 flax reference that costs ~1e-3 absolute here
    np.testing.assert_allclose(np.asarray(gb), np.asarray(fb), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(fl), atol=5e-3)

    out = fused.detect_batch(fused.params, jnp.asarray(images))
    assert out.boxes.shape == (2, CFG.max_detections, 4)
