"""Int8-activation SSD-MobileNetV2 inference: every backbone/extras conv
runs as int8 x int8 -> int32 on the MXU with BN folded into the weights,
halving activation HBM traffic (the forward is memory-bound — measured
~2.7 ms of the 3.5 ms device step at batch 32, BENCHMARKS.md).

This is the full-quantization analog of the reference's EdgeTPU path
(the .tflite the reference serves is an int8 graph produced by the
EdgeTPU compiler, /root/reference/watsor/detection/edge_tpu.py); here
quantization is a first-class transform:

    detector  = build_detector(cfg, params=...)        # float
    qdetector = build_int8_detector(detector, calibration_images)

- weights: per-output-channel symmetric int8 (BN pre-folded);
- activations: per-tensor symmetric int8, scales calibrated by running
  the float model with captured intermediates over calibration frames;
- the box/class conv heads stay in the float dtype (tiny cost,
  accuracy-sensitive); decode+NMS unchanged.

The quantized forward is an explicit walk of the MobileNetV2+SSD
structure (mirrors models/mobilenet_v2.py / models/ssd.py) driven by a
pytree "pack" of folded int8 weights — jit/XLA fuses each requant chain
into its conv epilogue so inter-layer tensors land in HBM as int8.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.models.mobilenet_v2 import MOBILENET_V2_BLOCKS, \
    _make_divisible
from watsor_tpu.models.ssd import DetectionsBatch, Detector, SSDConfig
from watsor_tpu.ops.boxes import decode_boxes
from watsor_tpu.ops.nms import batched_class_aware_nms
from watsor_tpu.ops.preprocess import resize_bilinear_mxu

_BN_EPS = 1e-3


def _block_plan():
    """(index, expand_ratio, features, strides) for blocks 0..16."""
    plan = []
    index = 0
    for expand, features, repeats, first_stride in MOBILENET_V2_BLOCKS:
        for i in range(repeats):
            plan.append((index, expand, _make_divisible(features),
                         first_stride if i == 0 else 1))
            index += 1
    return plan


def fold_unit(unit_params, unit_stats):
    """ConvBNRelu6 params + batch stats -> (folded kernel, bias)."""
    kernel = np.asarray(unit_params['Conv_0']['kernel'], np.float32)
    gamma = np.asarray(unit_params['BatchNorm_0']['scale'], np.float32)
    beta = np.asarray(unit_params['BatchNorm_0']['bias'], np.float32)
    mean = np.asarray(unit_stats['BatchNorm_0']['mean'], np.float32)
    var = np.asarray(unit_stats['BatchNorm_0']['var'], np.float32)
    factor = gamma / np.sqrt(var + _BN_EPS)
    return kernel * factor, beta - mean * factor


def _quantize_kernel(kernel):
    """Per-output-channel symmetric int8 — the single quantizer from
    models/quantize.py applied to one (always 4-D, BN-folded) kernel."""
    from watsor_tpu.models.quantize import quantize_params
    leaf = quantize_params({'kernel': np.asarray(kernel, np.float32)})[
        'kernel']
    return np.asarray(leaf.values), np.asarray(leaf.scales)


class QUnit(NamedTuple):
    """One folded, quantized conv unit."""

    kernel: Any       # int8 [kh, kw, in/groups, out]
    wscale: Any       # float32 [out]
    bias: Any         # float32 [out]
    out_scale: Any    # float32 scalar: int8 quantum of this unit's OUTPUT


# conv-unit geometry is code, not data: (groups, strides) resolved at
# trace time from the walk below; the pack carries only tensors.


def _unit_paths(cfg: SSDConfig):
    """Every ConvBNRelu6 unit path in forward order (backbone + extras)."""
    paths = [('backbone', 'stem')]
    for index, expand, _, _ in _block_plan():
        if index == 13:
            paths += [('backbone', 'block13_expand'),
                      ('backbone', 'block13_depthwise'),
                      ('backbone', 'block13_project')]
            continue
        block = 'block{}'.format(index)
        if expand != 1:
            paths.append(('backbone', block, 'expand'))
        paths += [('backbone', block, 'depthwise'),
                  ('backbone', block, 'project')]
    paths.append(('backbone', 'head'))
    for i in range(len(cfg.extra_features)):
        paths += [('extra{}_pw'.format(i),), ('extra{}'.format(i),)]
    return paths


def _tree_get(tree, path):
    for key in path:
        tree = tree[key]
    return tree


def calibrate(detector: Detector, images_u8, batch_limit=8):
    """Run the float model once with captured intermediates; returns
    {path_tuple: absmax} for every module output. The whole capture+reduce
    runs as ONE jitted program (per-op dispatch would crawl, and only the
    per-layer scalars come back to the host)."""
    cfg = detector.config

    @jax.jit
    def run(params, images):
        x = resize_bilinear_mxu(images, cfg.input_size, cfg.input_size,
                                dtype=jnp.float32)
        x = (x * (2.0 / 255.0) - 1.0).astype(cfg.dtype)
        _, state = detector.model.apply(params, x, train=False,
                                        capture_intermediates=True,
                                        mutable=['intermediates'])
        return jax.tree_util.tree_map(
            lambda t: jnp.max(jnp.abs(t.astype(jnp.float32))),
            state['intermediates'])

    maxima = jax.device_get(run(detector.params,
                                jnp.asarray(images_u8[:batch_limit])))

    absmax = {}

    def visit(tree, prefix):
        for key, value in tree.items():
            if key == '__call__':
                out = value[0]
                out = out[0] if isinstance(out, tuple) else out
                absmax[prefix] = float(out)
            elif isinstance(value, dict):
                visit(value, prefix + (key,) if prefix else (key,))

    visit(maxima, ())
    return absmax


def build_pack(detector: Detector, absmax):
    """Folded int8 weight pack + per-unit output scales from calibration."""
    params = detector.params['params']
    stats = detector.params['batch_stats']
    pack = {}
    for path in _unit_paths(detector.config):
        kernel, bias = fold_unit(_tree_get(params, path),
                                 _tree_get(stats, path))
        q, wscale = _quantize_kernel(kernel)
        out_absmax = absmax.get(path)
        if out_absmax is None or out_absmax == 0.0:
            out_absmax = 6.0          # relu6 bound as a safe default
        pack['/'.join(path)] = QUnit(jnp.asarray(q), jnp.asarray(wscale),
                                     jnp.asarray(bias),
                                     jnp.float32(out_absmax / 127.0))
    # block outputs (post-residual) define the NEXT block's input scale
    scales = {}
    for path, value in absmax.items():
        scales['/'.join(path)] = np.float32(max(value, 1e-6) / 127.0)
    pack['__scales__'] = {k: jnp.float32(v) for k, v in scales.items()}
    return pack


import os as _os


def _pointwise_mode():
    """Formulation of the int8 1x1 (pointwise) units — the bulk of the
    MXU work. 'conv' = int8 conv_general_dilated; 'dot' = XLA
    dot_general on the flattened [B*H*W, C] view; 'pallas' = fused
    matmul+requant kernel (ops/int8_matmul.py, int8 in/out).

    Measured on v5e at batch 32 (BENCHMARKS.md round 3,
    scripts/bench_int8_full.py): conv 5.61 ms, dot 13.62 ms, pallas
    14.12 ms vs bf16 5.29 ms — the matmul formulations lose 2.5x to
    NHWC<->2D relayouts XLA inserts around them, and conv (inter-layer
    tensors already int8 in HBM) still doesn't beat bf16: the forward is
    not activation-bandwidth-bound. 'conv' is therefore the default
    everywhere; the others remain for future hardware/toolchains."""
    return _os.environ.get('WATSOR_INT8_POINTWISE', 'conv')


def _is_pointwise(unit: QUnit, strides, groups):
    kh, kw = unit.kernel.shape[:2]
    return kh == 1 and kw == 1 and strides == 1 and groups == 1


def _pointwise(x_i8, x_scale, unit: QUnit, relu6, out_scale):
    """1x1 conv as an [B*H*W, K] x [K, N] int8 matmul; out_scale=None
    returns float."""
    B, H, W, C = x_i8.shape
    w2 = unit.kernel.reshape(C, -1)
    scale = x_scale * unit.wscale
    flat = x_i8.reshape(-1, C)
    if _pointwise_mode() == 'pallas':
        from watsor_tpu.ops.int8_matmul import int8_matmul_requant
        y = int8_matmul_requant(flat, w2, scale, unit.bias,
                                out_scale=out_scale, relu6=relu6)
    else:
        y = jax.lax.dot_general(flat, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * scale + unit.bias
        if relu6:
            y = jnp.clip(y, 0.0, 6.0)
        if out_scale is not None:
            y = jnp.clip(jnp.round(y / out_scale), -127.0, 127.0) \
                .astype(jnp.int8)
    return y.reshape(B, H, W, -1)


def _qconv(x_i8, x_scale, unit: QUnit, strides=1, groups=1, relu6=True,
           out_scale=None):
    """int8 conv + fused dequant/bias/act/requant epilogue.

    Returns (y_i8, y_scale). ``out_scale`` overrides the unit's own output
    quantum (used when the consumer is a residual add at the block scale).
    Pointwise units take the matmul formulation (see ``_pointwise_mode``);
    depthwise/strided/3x3 units stay on the conv lowering.
    """
    scale = out_scale if out_scale is not None else unit.out_scale
    if _is_pointwise(unit, strides, groups) and _pointwise_mode() != 'conv':
        return _pointwise(x_i8, x_scale, unit, relu6, scale), scale
    y = jax.lax.conv_general_dilated(
        x_i8, unit.kernel,
        window_strides=(strides, strides), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x_scale * unit.wscale) + unit.bias
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    y_i8 = jnp.clip(jnp.round(y / scale), -127.0, 127.0).astype(jnp.int8)
    return y_i8, scale


def _qconv_f(x_i8, x_scale, unit: QUnit, strides=1, groups=1, relu6=True):
    """Same conv, float output (for residual adds / head features)."""
    if _is_pointwise(unit, strides, groups) and _pointwise_mode() != 'conv':
        return _pointwise(x_i8, x_scale, unit, relu6, None)
    y = jax.lax.conv_general_dilated(
        x_i8, unit.kernel,
        window_strides=(strides, strides), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x_scale * unit.wscale) + unit.bias
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    return y


def _requant(y_f, scale):
    return jnp.clip(jnp.round(y_f / scale), -127.0, 127.0) \
        .astype(jnp.int8), scale


def quantized_features(pack, x_i8, x_scale, cfg: SSDConfig):
    """The int8 backbone+extras walk. Returns the 6 head feature maps as
    (tensor_i8, scale) pairs in pyramid order."""
    unit = lambda *path: pack['/'.join(path)]
    scales = pack['__scales__']

    x, s = _qconv(x_i8, x_scale, unit('backbone', 'stem'), strides=2)
    tap_c4 = None
    prev_features = _make_divisible(32)
    for index, expand, features, strides in _block_plan():
        if index == 13:
            y, sy = _qconv(x, s, unit('backbone', 'block13_expand'))
            tap_c4 = (y, sy)
            y, sy = _qconv(y, sy, unit('backbone', 'block13_depthwise'),
                           strides=strides, groups=y.shape[-1])
            x, s = _qconv(y, sy, unit('backbone', 'block13_project'),
                          relu6=False)
            prev_features = features
            continue
        block = 'block{}'.format(index)
        residual = strides == 1 and prev_features == features
        y, sy = (x, s)
        if expand != 1:
            y, sy = _qconv(y, sy, unit('backbone', block, 'expand'))
        y, sy = _qconv(y, sy, unit('backbone', block, 'depthwise'),
                       strides=strides, groups=y.shape[-1])
        if residual:
            y_f = _qconv_f(y, sy, unit('backbone', block, 'project'),
                           relu6=False)
            y_f = y_f + x.astype(jnp.float32) * s
            x, s = _requant(y_f, scales['backbone/' + block])
        else:
            x, s = _qconv(y, sy, unit('backbone', block, 'project'),
                          relu6=False)
        prev_features = features
    c5, s5 = _qconv(x, s, unit('backbone', 'head'))

    features = [tap_c4, (c5, s5)]
    y, sy = c5, s5
    for i in range(len(cfg.extra_features)):
        y, sy = _qconv(y, sy, unit('extra{}_pw'.format(i)))
        y, sy = _qconv(y, sy, unit('extra{}'.format(i)), strides=2)
        features.append((y, sy))
    return features


def build_int8_detector(detector: Detector, calibration_images_u8,
                        rng=None) -> Detector:
    """Float detector + calibration frames -> a Detector whose
    detect_batch runs the int8 forward (same output contract)."""
    cfg = detector.config
    assert getattr(cfg, 'backbone', 'mobilenet_v2') == 'mobilenet_v2' \
        and not getattr(cfg, 'lite', False), \
        'int8 walk covers the plain MobileNetV2 SSD only'
    assert cfg.width_multiplier == 1.0, \
        'int8 walk currently assumes the width-1.0 channel plan'
    absmax = calibrate(detector, calibration_images_u8)
    pack = build_pack(detector, absmax)

    head_params = {
        key: value for key, value in detector.params['params'].items()
        if key.startswith(('box_head', 'cls_head'))
    }
    anchors_dev = jnp.asarray(detector.anchors)
    num_cls = cfg.num_classes + 1

    def raw_apply(bundle, images_f):
        pk, heads = bundle
        # [-1, 1] float input -> int8 (quantum 1/127)
        x_i8 = jnp.clip(jnp.round(images_f.astype(jnp.float32) * 127.0),
                        -127.0, 127.0).astype(jnp.int8)
        feats = quantized_features(pk, x_i8, jnp.float32(1.0 / 127.0), cfg)
        box_out, cls_out = [], []
        for i, (feat_i8, s) in enumerate(feats):
            feat = (feat_i8.astype(cfg.dtype) * s.astype(cfg.dtype))
            def conv(p, n_out):
                return jax.lax.conv_general_dilated(
                    feat, p['kernel'].astype(cfg.dtype),
                    window_strides=(1, 1), padding='SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.float32) + \
                    p['bias'].astype(jnp.float32)
            b = conv(heads['box_head{}'.format(i)], 4)
            c = conv(heads['cls_head{}'.format(i)], num_cls)
            B = feat.shape[0]
            box_out.append(b.reshape(B, -1, 4))
            cls_out.append(c.reshape(B, -1, num_cls))
        return (jnp.concatenate(box_out, axis=1),
                jnp.concatenate(cls_out, axis=1))

    from watsor_tpu.models.ssd import make_detect_batch
    # int8 path quantizes from f32 (no dtype cast before raw_apply)
    detect_batch = make_detect_batch(
        cfg, anchors_dev, raw_apply, lambda x: x * (2.0 / 255.0) - 1.0)

    bundle = (pack, head_params)
    return detector._replace(params=bundle, detect_batch=detect_batch,
                             raw_apply=raw_apply)
