"""EfficientDet HBM-diet knobs: exactness proofs on the CPU backend.

Round-4 work on the verdict's "EffDet-Lite0-2 efficiency" item: two
candidate traffic reductions must be numerically safe before they are
measured on the chip.

1. The broadcast-based exact-2x nearest upsample in the BiFPN
   (models/efficientdet._resize_to) must match jax.image.resize
   bit-for-bit — it replaces a gather with a fusable broadcast+reshape.
2. The fused dual head (_DualHead + fuse_dual_head_params) must
   reproduce the standard two-head forward: depthwise kernels
   concatenate per-channel and the pointwise stages become
   block-diagonal, so the zero off-blocks add exact zeros to the f32
   accumulators and the outputs agree to float tolerance.

The reference has no analog (its heads live inside opaque TFLite/TRT
graphs, /root/reference/watsor/detection/tensorflow_lite_cpu.py); this
is rebuild-only optimization surface.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from watsor_tpu.models.efficientdet import (  # noqa: E402
    _resize_to, build_effdet, fuse_dual_head_params, lite_config)


def test_exact_2x_upsample_matches_resize_nearest():
    rng = np.random.RandomState(7)
    for (h, w) in [(5, 5), (10, 10), (7, 9), (20, 20)]:
        x = jnp.asarray(rng.uniform(-3, 3, (2, h, w, 16)).astype(np.float32))
        fast = _resize_to(x, 2 * h, 2 * w)
        ref = jax.image.resize(x, (2, 2 * h, 2 * w, 16), method='nearest')
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_non_integer_upsample_still_uses_resize():
    x = jnp.asarray(np.arange(2 * 3 * 3 * 4, dtype=np.float32)
                    .reshape(2, 3, 3, 4))
    out = _resize_to(x, 5, 5)
    ref = jax.image.resize(x, (2, 5, 5, 4), method='nearest')
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.fixture(scope='module')
def tiny_pair():
    """Standard and fused detectors sharing the SAME weights (tiny
    geometry so the CPU forward stays fast)."""
    cfg = lite_config('lite0', input_size=64, num_classes=7,
                      fpn_channels=8, fpn_repeats=1, head_repeats=2,
                      dtype=jnp.float32)
    std = build_effdet(cfg)
    fused = build_effdet(cfg._replace(fused_heads=True), params=std.params)
    return std, fused


def test_fused_param_tree_shapes(tiny_pair):
    std, fused = tiny_pair
    tree = fused.params['params']['dual_head']
    assert 'cls_head' not in fused.params['params']
    assert 'box_head' not in fused.params['params']
    C = std.config.fpn_channels
    assert tree['sep0']['dw']['kernel'].shape == (3, 3, 1, 2 * C)
    assert tree['sep0']['pw']['kernel'].shape == (1, 1, 2 * C, 2 * C)
    # the block-diagonal zero structure
    pw = np.asarray(tree['sep0']['pw']['kernel'])
    assert np.all(pw[:, :, :C, C:] == 0)
    assert np.all(pw[:, :, C:, :C] == 0)
    ncls = std.config.anchors_per_cell * std.config.num_class_outputs
    nbox = std.config.anchors_per_cell * 4
    assert tree['predict']['pw']['kernel'].shape == (1, 1, 2 * C,
                                                     ncls + nbox)
    # batch_stats fused too
    bs = fused.params['batch_stats']['dual_head']
    assert bs['bn0_l0']['mean'].shape == (2 * C,)


def test_fused_head_matches_standard_forward(tiny_pair):
    std, fused = tiny_pair
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    boxes_s, logits_s = std.raw_apply(std.params, x)
    boxes_f, logits_f = fused.raw_apply(fused.params, x)
    np.testing.assert_allclose(np.asarray(boxes_f), np.asarray(boxes_s),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_s),
                               atol=1e-5, rtol=1e-5)


def test_fused_detect_batch_matches_standard(tiny_pair):
    std, fused = tiny_pair
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 160, 200, 3), np.uint8)
    out_s = jax.tree_util.tree_map(np.asarray,
                                   std.detect_batch(std.params, img))
    out_f = jax.tree_util.tree_map(np.asarray,
                                   fused.detect_batch(fused.params, img))
    boxes_s, scores_s, classes_s, valid_s = out_s
    boxes_f, scores_f, classes_f, valid_f = out_f
    np.testing.assert_array_equal(valid_f, valid_s)
    n = int(valid_s[0])
    np.testing.assert_array_equal(classes_f[0, :n], classes_s[0, :n])
    np.testing.assert_allclose(boxes_f[0, :n], boxes_s[0, :n], atol=1e-4)
    np.testing.assert_allclose(scores_f[0, :n], scores_s[0, :n], atol=1e-4)


@pytest.mark.slow   # builds a full Lite0 (multi-minute CPU compile)
def test_zoo_env_knob_builds_fused(monkeypatch):
    from watsor_tpu.models.zoo import build_from_zoo
    monkeypatch.setenv('WATSOR_FUSED_HEADS', '1')
    det = build_from_zoo('efficientdet_lite0')
    assert det.config.fused_heads
    assert 'dual_head' in det.params['params']
