"""Packed (space-to-depth) conv ops must match the plain formulations
exactly — every transform in ops/packed_conv.py is a re-association of
the same multiply-adds (see its module docstring), so unpack(packed_op(
pack(x))) == op(x) to float tolerance for all kernel/stride combinations
the EfficientNet-Lite early stages use (k3/k5, s1/s2, depthwise/dense/
pointwise)."""

import numpy as np

import jax
import jax.numpy as jnp

from watsor_tpu.ops.packed_conv import (depth_to_space, packed_bn,
                                        packed_dense, packed_depthwise,
                                        packed_pointwise, space_to_depth)


def _ref_conv(x, w, stride, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding='SAME',
        feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def test_space_to_depth_round_trip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(
        space_to_depth(x))), np.asarray(x))
    # c-major order: packed channel c*4 + dy*2 + dx
    p = space_to_depth(x)
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 4 * 3 + 2 * 1 + 0]),
                                  np.asarray(x[0, 1, 0, 3]))


def test_packed_depthwise_matches_all_kernel_stride_combos():
    rng = np.random.RandomState(1)
    c = 6
    x = jnp.asarray(rng.randn(2, 16, 16, c).astype(np.float32))
    xp = space_to_depth(x)
    for k in (3, 5):
        w = jnp.asarray(rng.randn(k, k, 1, c).astype(np.float32))
        for s in (1, 2):
            ref = _ref_conv(x, w, s, groups=c)
            got = depth_to_space(packed_depthwise(xp, w, s, x.shape[1]))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5,
                                       err_msg=f'k={k} s={s}')


def test_packed_dense_stem_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    ref = _ref_conv(x, w, 2)
    got = depth_to_space(packed_dense(space_to_depth(x), w, 2, x.shape[1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_pointwise_matches():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 6, 10).astype(np.float32))
    ref = _ref_conv(x, w, 1)
    got = depth_to_space(packed_pointwise(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_bn_matches_flax_batchnorm():
    import flax.linen as nn
    rng = np.random.RandomState(4)
    c = 5
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    mean = jnp.asarray(rng.randn(c).astype(np.float32))
    var = jnp.asarray(rng.rand(c).astype(np.float32) + 0.1)
    bn = nn.BatchNorm(use_running_average=True, momentum=0.99,
                      epsilon=1e-3)
    ref = bn.apply({'params': {'scale': scale, 'bias': bias},
                    'batch_stats': {'mean': mean, 'var': var}}, x)
    ref = jnp.minimum(nn.relu(ref), 6.0)
    got = depth_to_space(packed_bn(space_to_depth(x), scale, bias,
                                   mean, var))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backbone_packing_matches_standard():
    """EfficientNetLite(packing='stem'|'early') must reproduce the
    standard forward from the SAME param tree — init always builds the
    standard modules, apply computes the packed formulation (f32 here;
    the re-associated conv sums differ only in rounding)."""
    from watsor_tpu.models.efficientnet_lite import EfficientNetLite

    rng = np.random.RandomState(5)
    for variant, packing in (('lite0', 'early'), ('lite4', 'early'),
                             ('lite0', 'stem')):
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        std = EfficientNetLite(variant, dtype=jnp.float32)
        pkd = EfficientNetLite(variant, dtype=jnp.float32,
                               packing=packing)
        variables = std.init(jax.random.PRNGKey(0), x)
        ref = std.apply(variables, x, False)
        got = pkd.apply(variables, x, False)
        assert jax.tree_util.tree_structure(
            pkd.init(jax.random.PRNGKey(0), x)) == \
            jax.tree_util.tree_structure(variables)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=2e-4, rtol=2e-4,
                                       err_msg=f'{variant}/{packing}')
