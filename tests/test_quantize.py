"""Int8 weight quantization: round-trip error bounds and detection-output
agreement with the float path."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from watsor_tpu.models.quantize import (build_quantized_detector,
                                        dequantize_params, quantize_params,
                                        QuantizedLeaf)
from watsor_tpu.models.ssd import SSDConfig, build_detector

TINY = SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32)


def test_quantize_round_trip_error_small():
    kernel = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
    tree = {'params': {'conv': {'kernel': kernel}}}
    quantized = quantize_params(tree)
    leaf = quantized['params']['conv']['kernel']
    assert isinstance(leaf, QuantizedLeaf)
    assert leaf.values.dtype == jnp.int8
    restored = dequantize_params(quantized, jnp.float32)
    err = np.abs(np.asarray(restored['params']['conv']['kernel']) -
                 np.asarray(kernel))
    # symmetric int8: error bounded by scale/2 = absmax/254 per channel
    per_ch_absmax = np.abs(np.asarray(kernel)).reshape(-1, 16).max(axis=0)
    assert (err <= per_ch_absmax / 254 + 1e-6).all()


def test_non_kernel_leaves_untouched():
    tree = {'params': {'bn': {'scale': jnp.ones(4), 'bias': jnp.zeros(4)}}}
    quantized = quantize_params(tree)
    assert quantized['params']['bn']['scale'].dtype == jnp.float32


def test_quantized_detector_matches_float():
    base = build_detector(TINY, rng=jax.random.PRNGKey(1))
    quantized = build_quantized_detector(TINY, rng=jax.random.PRNGKey(1))
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 96, 96, 3), np.uint8))
    out_f = base.detect_batch(base.params, frames)
    out_q = quantized.detect_batch(quantized.params, frames)
    # detections from a randomly-initialized net are noise-level scores;
    # int8 weights must keep the score field close and shapes identical
    assert out_q.boxes.shape == out_f.boxes.shape
    diff = np.abs(np.asarray(out_f.scores) - np.asarray(out_q.scores))
    assert diff.max() < 0.05, 'quantized scores diverged: {}'.format(
        diff.max())
