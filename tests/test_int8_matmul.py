"""Pallas fused int8 matmul + requant kernel vs plain-jnp reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from watsor_tpu.ops.int8_matmul import int8_matmul_requant, reference_requant


@pytest.mark.parametrize('shape', [(256, 96, 24), (96, 64, 384),
                                   (160, 1280, 512)])
@pytest.mark.parametrize('out_scale', [0.047, None])
def test_kernel_matches_reference(shape, out_scale):
    M, K, N = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (N,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(N), jnp.float32)

    got = int8_matmul_requant(x, w, scale, bias, out_scale=out_scale,
                              block_m=64, block_n=128, interpret=True)
    want = reference_requant(x, w, scale, bias, out_scale=out_scale)
    if out_scale is None:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    else:
        # round-to-nearest ties may differ by 1 quantum at exact .5
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
        assert (diff <= 1).all() and (diff == 0).mean() > 0.999


def test_relu6_off_for_project_layers():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (64, 32)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (32, 128)), jnp.int8)
    scale = jnp.full((128,), 1e-3, jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = int8_matmul_requant(x, w, scale, bias, relu6=False,
                              block_m=64, block_n=128, interpret=True)
    want = reference_requant(x, w, scale, bias, relu6=False)
    assert np.asarray(got).min() < 0  # negatives survive
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
