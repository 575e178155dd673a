"""SSD-MobileNetV2 forward with fused inverted-residual Pallas blocks.

XLA runs each block as three convolutions, round-tripping the 6x-expanded
activations through HBM; ops/fused_block.py keeps them in VMEM for the 12
stride-1 blocks. BatchNorm is pre-folded (inference), so the walk consumes
a plain (kernel, bias) pack derived from the float detector's params —
weight sources (checkpoint conversion, training) stay unchanged.

    detector = build_detector(cfg, params=...)
    fdetector = build_fused_detector(detector)   # same Detector contract

Enabled in the application with WATSOR_FUSED_BLOCKS=1 (wired in main.py;
MobileNetV2 SSD only); BENCHMARKS.md numbers keep XLA the default.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.models.ssd import DetectionsBatch, Detector, SSDConfig
from watsor_tpu.models.ssd_int8 import _block_plan, _tree_get, _unit_paths, \
    fold_unit
from watsor_tpu.ops.boxes import decode_boxes
from watsor_tpu.ops.fused_block import fused_inverted_residual
from watsor_tpu.ops.nms import batched_class_aware_nms
from watsor_tpu.ops.preprocess import resize_bilinear_mxu


def build_folded_pack(detector: Detector):
    """Float (kernel, bias) per conv unit, BN folded."""
    params = detector.params['params']
    stats = detector.params['batch_stats']
    pack = {}
    for path in _unit_paths(detector.config):
        kernel, bias = fold_unit(_tree_get(params, path),
                                 _tree_get(stats, path))
        pack['/'.join(path)] = (jnp.asarray(kernel), jnp.asarray(bias))
    for key, value in params.items():
        if key.startswith(('box_head', 'cls_head')):
            pack[key] = (jnp.asarray(value['kernel']),
                         jnp.asarray(value['bias']))
    return pack


def _conv(x, kernel, bias, strides=1, groups=1, relu6=True,
          dtype=jnp.bfloat16):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(strides, strides), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    y = y + bias
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    return y.astype(dtype)


def fused_features(pack, x, cfg: SSDConfig):
    """Backbone + extras with Pallas fused blocks where eligible."""
    dtype = cfg.dtype
    unit = lambda *path: pack['/'.join(path)]
    # Mosaic lowers only on TPU; CPU (tests) runs the kernel interpreted
    interpret = jax.default_backend() != 'tpu'

    x = _conv(x, *unit('backbone', 'stem'), strides=2, dtype=dtype)
    tap_c4 = None
    prev_features = x.shape[-1]
    for index, expand, features, strides in _block_plan():
        if index == 13:
            y = _conv(x, *unit('backbone', 'block13_expand'), dtype=dtype)
            tap_c4 = y
            y = _conv(y, *unit('backbone', 'block13_depthwise'),
                      strides=strides, groups=y.shape[-1], dtype=dtype)
            x = _conv(y, *unit('backbone', 'block13_project'),
                      relu6=False, dtype=dtype)
            prev_features = features
            continue
        block = 'block{}'.format(index)
        residual = strides == 1 and prev_features == features
        if strides == 1 and expand != 1:
            # the fused VMEM-resident path; 1x1 kernels flatten to
            # [C_in, E] / [E, C_out], depthwise to [3, 3, E]
            we, be = unit('backbone', block, 'expand')
            wd, bd = unit('backbone', block, 'depthwise')
            wp, bp = unit('backbone', block, 'project')
            x = fused_inverted_residual(
                x, we.reshape(we.shape[2], we.shape[3]), be,
                wd.reshape(3, 3, wd.shape[3] * wd.shape[2]), bd,
                wp.reshape(wp.shape[2], wp.shape[3]), bp,
                residual=residual, interpret=interpret)
        else:
            y = x
            if expand != 1:
                y = _conv(y, *unit('backbone', block, 'expand'), dtype=dtype)
            y = _conv(y, *unit('backbone', block, 'depthwise'),
                      strides=strides, groups=y.shape[-1], dtype=dtype)
            y = _conv(y, *unit('backbone', block, 'project'),
                      relu6=False, dtype=dtype)
            x = y + x if residual else y
        prev_features = features
    c5 = _conv(x, *unit('backbone', 'head'), dtype=dtype)

    features = [tap_c4, c5]
    y = c5
    for i in range(len(cfg.extra_features)):
        y = _conv(y, *unit('extra{}_pw'.format(i)), dtype=dtype)
        y = _conv(y, *unit('extra{}'.format(i)), strides=2, dtype=dtype)
        features.append(y)
    return features


def build_fused_detector(detector: Detector) -> Detector:
    cfg = detector.config
    assert getattr(cfg, 'backbone', 'mobilenet_v2') == 'mobilenet_v2' \
        and not getattr(cfg, 'lite', False), \
        'fused walk covers the plain MobileNetV2 SSD only'
    assert cfg.width_multiplier == 1.0, \
        'fused walk currently assumes the width-1.0 channel plan'
    pack = build_folded_pack(detector)
    anchors_dev = jnp.asarray(detector.anchors)
    num_cls = cfg.num_classes + 1

    def raw_apply(pk, images_f):
        feats = fused_features(pk, images_f.astype(cfg.dtype), cfg)
        box_out, cls_out = [], []
        for i, feat in enumerate(feats):
            b = _conv(feat, *pk['box_head{}'.format(i)], relu6=False,
                      dtype=cfg.dtype).astype(jnp.float32)
            c = _conv(feat, *pk['cls_head{}'.format(i)], relu6=False,
                      dtype=cfg.dtype).astype(jnp.float32)
            B = feat.shape[0]
            box_out.append(b.reshape(B, -1, 4))
            cls_out.append(c.reshape(B, -1, num_cls))
        return (jnp.concatenate(box_out, axis=1),
                jnp.concatenate(cls_out, axis=1))

    from watsor_tpu.models.ssd import make_detect_batch
    detect_batch = make_detect_batch(
        cfg, anchors_dev, raw_apply,
        lambda x: (x * (2.0 / 255.0) - 1.0).astype(cfg.dtype))

    return detector._replace(params=pack, detect_batch=detect_batch,
                             raw_apply=raw_apply)
