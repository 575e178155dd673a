"""EfficientDet-Lite detector (Flax): EfficientNet-Lite backbone + BiFPN +
shared separable-conv heads, with the same fused post-processing contract
as the SSD family (decode + class-aware NMS on device, boxes/scores/
1-based classes padded to a static max — see models/ssd.py).

Clean re-implementation of the published EfficientDet design
(arXiv:1911.09070) with the Lite simplifications, structured to match the
google/automl reference computation exactly so the public
``efficientdet-lite{0..4}`` checkpoints convert with numerically matching
outputs (models/convert_effdet.py):

  - ReLU6 activations, no squeeze-excite (the Lite cuts);
  - plain-sum feature fusion in the BiFPN (``fpn_weight_method='sum'``, the
    quantization-friendly Lite choice; fast-attention with per-node WSM
    weights is also supported for the non-Lite checkpoints);
  - each fusion node applies activation BEFORE its separable conv, the conv
    carries a bias, and BatchNorm follows with no second activation (the
    automl ``conv_bn_act_pattern=False`` ordering);
  - lateral channel projections are per-node 1x1 conv+BN "resample" ops
    inside the FIRST BiFPN cell (P4/P5 are projected twice with independent
    weights — the automl layout), plus the standalone ``resample_p6``;
  - heads are separable convs (single bias on the pointwise stage) shared
    across levels with per-level BatchNorm, and a separable predict layer;
  - class logits have NO background column: scores are plain sigmoids and
    column ``i`` is 1-based label ``i+1`` (``explicit_background=False``);
  - inputs normalize as ``(x - 127) / 128`` (the Lite mean/stddev).

The reference serves such models only as opaque TFLite flatbuffers
(/root/reference/watsor/detection/tensorflow_lite_cpu.py); here the
architecture is first-class and jit-compiles into one XLA program.
"""

import math
import os
from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.models.efficientnet_lite import ConvBN, EfficientNetLite
from watsor_tpu.ops.boxes import decode_boxes
from watsor_tpu.ops.nms import batched_class_aware_nms
from watsor_tpu.ops.preprocess import resize_bilinear_mxu


# published EfficientDet-Lite compound scaling:
# variant -> (input_size, fpn_channels, fpn_repeats, head_repeats,
#             anchor_scale)
LITE_DET_SCALING = {
    'lite0': (320, 64, 3, 3, 3.0),
    'lite1': (384, 88, 4, 3, 3.0),
    'lite2': (448, 112, 5, 3, 3.0),
    'lite3': (512, 160, 6, 4, 4.0),
    'lite4': (640, 224, 7, 4, 4.0),
}


def lite_config(variant='lite0', **overrides):
    """EfficientDetConfig with the published per-variant scaling."""
    if variant not in LITE_DET_SCALING:
        raise ValueError(
            'unknown EfficientDet-Lite variant {!r}; supported: {}'.format(
                variant, ', '.join(sorted(LITE_DET_SCALING))))
    size, channels, fpn_r, head_r, anchor_scale = LITE_DET_SCALING[variant]
    return EfficientDetConfig(variant=variant, input_size=size,
                              fpn_channels=channels, fpn_repeats=fpn_r,
                              head_repeats=head_r,
                              anchor_scale=anchor_scale)._replace(**overrides)


class EfficientDetConfig(NamedTuple):
    num_classes: int = 90
    variant: str = 'lite0'
    input_size: int = 320
    fpn_channels: int = 64
    fpn_repeats: int = 3
    head_repeats: int = 3
    min_level: int = 3
    max_level: int = 7
    num_scales: int = 3
    aspect_ratios: Tuple[float, ...] = (1.0, 2.0, 0.5)
    anchor_scale: float = 3.0      # lite0-2 use 3.0, lite3/4 use 4.0
    fpn_weight_method: str = 'sum'  # 'sum' (Lite) | 'fastattn' (full models)
    explicit_background: bool = False  # automl: sigmoid heads, no bg column
    mean_rgb: float = 127.0        # Lite input normalization (x-127)/128
    stddev_rgb: float = 128.0
    iou_threshold: float = 0.6
    score_threshold: float = 0.005
    max_detections: int = 100
    box_coder_scales: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    nms_mode: str = 'fused'
    active_labels: Any = None      # restrict post-processing (see SSDConfig)
    dtype: Any = jnp.bfloat16
    # space-to-depth entry packing (ops/packed_conv.py): 'stem' feeds the
    # stem conv its input packed ([S/2,S/2,12] instead of the 128-lane-
    # padded [S,S,3]); 'early' (measured, rejected — see EfficientNetLite)
    packing: str = 'none'
    # run cls_head+box_head as one twice-wide stack (_DualHead): halves
    # pyramid reads and, below the 128-lane tile, padded intermediate
    # traffic; exact numerics (block-diagonal pointwise). Checkpoints
    # always store the two-head layout; build_effdet fuses at load.
    fused_heads: bool = False

    @property
    def num_levels(self):
        return self.max_level - self.min_level + 1

    @property
    def anchors_per_cell(self):
        return self.num_scales * len(self.aspect_ratios)

    @property
    def num_class_outputs(self):
        """Width of the class head per anchor (no background column in the
        automl convention)."""
        return self.num_classes + (1 if self.explicit_background else 0)


class SeparableConv(nn.Module):
    """The automl SeparableConv2D: 3x3 depthwise + 1x1 pointwise with a
    single bias on the pointwise output."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (3, 3), padding='SAME', use_bias=False,
                    feature_group_count=x.shape[-1], dtype=self.dtype,
                    name='dw')(x)
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name='pw')(x)


def _resize_to(x, h, w):
    """Nearest up / 3x3-stride-2 max-pool down between pyramid levels."""
    B, xh, xw, C = x.shape
    if xh == h and xw == w:
        return x
    if xh < h:  # upsample — nearest
        if h == 2 * xh and w == 2 * xw and \
                os.environ.get('WATSOR_UPSAMPLE') != 'gather':
            # WATSOR_UPSAMPLE=gather restores the resize lowering (A/B
            # escape; read at trace time — one process, one compile)
            # exact-2x nearest == pixel repeat (output pixel i reads input
            # i//2, identical to jax.image.resize 'nearest' — pinned by
            # tests/test_effdet_fused_head.py). Lowers to a fusable
            # broadcast+reshape instead of resize's gather, so XLA can
            # fold the upsample into the consuming fusion-node sum rather
            # than materializing the upsampled tensor in HBM.
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (B, xh, 2, xw, 2, C))
            return x.reshape(B, h, w, C)
        return jax.image.resize(x, (B, h, w, C), method='nearest')
    # downsample: stride-2 max pool
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')


class FNode(nn.Module):
    """One BiFPN fusion node: optional 1x1 conv+BN channel projection of a
    raw backbone input ("resample"), weighted/plain-sum fusion, then
    activation -> separable conv (with bias) -> BatchNorm. This is the
    automl ordering for ``conv_bn_act_pattern=False`` — the configuration
    every published EfficientDet(-Lite) checkpoint was trained with."""

    features: int
    num_inputs: int
    resample_input: int = -1       # index of the input needing projection
    weight_method: str = 'sum'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs, train=False):
        xs = list(inputs)
        if self.resample_input >= 0:
            xs[self.resample_input] = ConvBN(
                self.features, (1, 1), act=False, dtype=self.dtype,
                name='resample')(xs[self.resample_input], train)
        if self.weight_method == 'fastattn':
            w = nn.relu(self.param('WSM', nn.initializers.ones,
                                   (self.num_inputs,)))
            w = w / (jnp.sum(w) + 1e-4)
            y = sum(w[i].astype(xs[0].dtype) * xs[i]
                    for i in range(self.num_inputs))
        else:                      # 'sum' — the Lite fusion
            y = sum(xs[1:], xs[0])
        y = jnp.minimum(nn.relu(y), 6.0)
        y = SeparableConv(self.features, dtype=self.dtype, name='conv')(y)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype, name='bn')(y)


class BiFPN(nn.Module):
    """One BiFPN cell over P3..P7. In the first cell the raw backbone taps
    (C3, C4, C5) are channel-projected inside the consuming nodes — P4 and
    P5 feed both a top-down and a bottom-up node and are projected twice
    with independent weights, matching the automl checkpoint layout."""

    channels: int
    first_cell: bool = False
    weight_method: str = 'sum'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train=False):
        p3, p4, p5, p6, p7 = feats
        shapes = [f.shape[1:3] for f in feats]
        c = self.channels
        wm = self.weight_method

        def up(x, target):
            return _resize_to(x, *target)

        def down(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')

        def rs(i):
            return i if self.first_cell else -1

        def node(k, n, resample, inputs):
            return FNode(c, n, resample, wm, self.dtype,
                         name=f'fnode{k}')(inputs, train)

        p6td = node(0, 2, -1, [p6, up(p7, shapes[3])])
        p5td = node(1, 2, rs(0), [p5, up(p6td, shapes[2])])
        p4td = node(2, 2, rs(0), [p4, up(p5td, shapes[1])])
        p3out = node(3, 2, rs(0), [p3, up(p4td, shapes[0])])
        p4out = node(4, 3, rs(0), [p4, p4td, down(p3out)])
        p5out = node(5, 3, rs(0), [p5, p5td, down(p4out)])
        p6out = node(6, 3, -1, [p6, p6td, down(p5out)])
        p7out = node(7, 2, -1, [p7, down(p6out)])
        return [p3out, p4out, p5out, p6out, p7out]


class _Head(nn.Module):
    """Separable-conv head: conv weights shared across levels, per-level
    BatchNorm, ReLU6 after each BN, separable predict layer (the automl
    class_net/box_net structure — repeats carry BOTH a conv bias and a BN,
    exactly as the checkpoints store them)."""

    out_features: int
    repeats: int
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train=False):
        convs = [SeparableConv(self.channels, dtype=self.dtype,
                               name=f'sep{r}')
                 for r in range(self.repeats)]
        final = SeparableConv(self.out_features, dtype=self.dtype,
                              name='predict')
        outputs = []
        for level, x in enumerate(feats):
            for r, conv in enumerate(convs):
                x = conv(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype,
                                 name=f'bn{r}_l{level}')(x)
                x = jnp.minimum(nn.relu(x), 6.0)
            outputs.append(final(x))
        return outputs


class _DualHead(nn.Module):
    """cls_head and box_head fused into ONE twice-wide separable stack.

    The two heads have identical structure (same repeats/channels, shared
    conv weights across levels, per-level BN) and both read every pyramid
    level — running them as one stack of width ``2*channels`` halves the
    pyramid reads and, when ``channels`` is below the 128-lane tile
    (Lite0: 64), halves the lane-padded HBM traffic of every intermediate.
    Numerics are exact: depthwise kernels concatenate per-channel, the
    pointwise stages become block-diagonal (the zero off-blocks add exact
    zeros to the f32 accumulators), BN is per-channel. Weights come from
    ``fuse_dual_head_params`` applied to the standard two-head layout —
    checkpoints and converters never see this layout.

    HBM-diet experiment for the round-3 verdict's EffDet-Lite0-2
    efficiency question; enabled by ``EfficientDetConfig.fused_heads``
    (env ``WATSOR_FUSED_HEADS=1``)."""

    cls_features: int
    box_features: int
    repeats: int
    channels: int          # per-head channels; the fused width is 2x
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train=False):
        width = 2 * self.channels
        convs = [SeparableConv(width, dtype=self.dtype, name=f'sep{r}')
                 for r in range(self.repeats)]
        final = SeparableConv(self.cls_features + self.box_features,
                              dtype=self.dtype, name='predict')
        cls_outs, box_outs = [], []
        for level, x in enumerate(feats):
            x = jnp.concatenate([x, x], axis=-1)
            for r, conv in enumerate(convs):
                x = conv(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype,
                                 name=f'bn{r}_l{level}')(x)
                x = jnp.minimum(nn.relu(x), 6.0)
            y = final(x)
            cls_outs.append(y[..., :self.cls_features])
            box_outs.append(y[..., self.cls_features:])
        return cls_outs, box_outs


def fuse_dual_head_params(variables, cfg: EfficientDetConfig):
    """Map standard two-head variables into the ``_DualHead`` layout.

    Depthwise kernels (3,3,1,C) concatenate along the channel axis;
    pointwise kernels become block-diagonal (1,1,2C,2C) with the box
    block offset by C on both axes; per-level BN params/stats
    concatenate. The predict stage maps cls->columns [:cls_features] and
    box->the rest, reading only its own half of the fused dw output.
    Pure numpy; applied once at build time."""
    cat = np.concatenate

    def _np(tree):
        return jax.tree_util.tree_map(np.asarray, tree)

    def _dw(cls_k, box_k):
        return {'kernel': cat([cls_k['kernel'], box_k['kernel']], axis=-1)}

    def _pw_diag(cls_k, box_k):
        ck, bk = cls_k['kernel'], box_k['kernel']
        c_in, c_out = ck.shape[2], ck.shape[3]
        b_in, b_out = bk.shape[2], bk.shape[3]
        k = np.zeros((1, 1, c_in + b_in, c_out + b_out), ck.dtype)
        k[:, :, :c_in, :c_out] = ck
        k[:, :, c_in:, c_out:] = bk
        out = {'kernel': k}
        if 'bias' in cls_k:
            out['bias'] = cat([cls_k['bias'], box_k['bias']])
        return out

    def _fuse_tree(cls_t, box_t):
        fused = {}
        for name in cls_t:
            if name.startswith('sep') or name == 'predict':
                fused[name] = {'dw': _dw(cls_t[name]['dw'],
                                         box_t[name]['dw']),
                               'pw': _pw_diag(cls_t[name]['pw'],
                                              box_t[name]['pw'])}
            else:   # bn{r}_l{level}: per-channel vectors
                fused[name] = {k: cat([cls_t[name][k], box_t[name][k]])
                               for k in cls_t[name]}
        return fused

    out = {}
    for coll, tree in variables.items():
        tree = dict(tree)
        if 'cls_head' in tree and 'box_head' in tree:
            cls_t = _np(tree.pop('cls_head'))
            box_t = _np(tree.pop('box_head'))
            tree['dual_head'] = _fuse_tree(cls_t, box_t)
        out[coll] = tree
    return out


class EfficientDet(nn.Module):
    config: EfficientDetConfig = EfficientDetConfig()

    @nn.compact
    def __call__(self, images, train=False):
        cfg = self.config
        c3, c4, c5 = EfficientNetLite(cfg.variant, dtype=cfg.dtype,
                                      packing=cfg.packing,
                                      name='backbone')(images, train)
        # P6 = pool(1x1 conv+BN of C5); P7 = pool(P6) — the automl
        # resample_p6/resample_p7 pair (p7 has no weights)
        p6 = nn.max_pool(ConvBN(cfg.fpn_channels, (1, 1), act=False,
                                dtype=cfg.dtype,
                                name='resample_p6')(c5, train),
                         (3, 3), strides=(2, 2), padding='SAME')
        p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding='SAME')
        feats = [c3, c4, c5, p6, p7]

        for r in range(cfg.fpn_repeats):
            feats = BiFPN(cfg.fpn_channels, first_cell=(r == 0),
                          weight_method=cfg.fpn_weight_method,
                          dtype=cfg.dtype, name=f'bifpn{r}')(feats, train)

        num_anchors = cfg.anchors_per_cell
        num_cls = cfg.num_class_outputs
        if cfg.fused_heads:
            cls_outputs, box_outputs = _DualHead(
                num_anchors * num_cls, num_anchors * 4, cfg.head_repeats,
                cfg.fpn_channels, dtype=cfg.dtype,
                name='dual_head')(feats, train)
        else:
            cls_outputs = _Head(num_anchors * num_cls, cfg.head_repeats,
                                cfg.fpn_channels, dtype=cfg.dtype,
                                name='cls_head')(feats, train)
            box_outputs = _Head(num_anchors * 4, cfg.head_repeats,
                                cfg.fpn_channels, dtype=cfg.dtype,
                                name='box_head')(feats, train)
        B = images.shape[0]
        boxes = jnp.concatenate(
            [b.reshape(B, -1, 4) for b in box_outputs], axis=1)
        logits = jnp.concatenate(
            [c.reshape(B, -1, num_cls) for c in cls_outputs], axis=1)
        # native dtype: at Lite4 scale the [B, 76725, 90] logits are 3% of
        # the step's HBM bytes PER PASS — the f32 cast for external
        # consumers (parity tests, converters, training) lives in
        # build_effdet's raw_apply; the fused detect path keeps bf16
        return boxes, logits


def effdet_feature_shapes(cfg: EfficientDetConfig):
    shapes = []
    size = cfg.input_size
    dims = {}
    d = size
    for level in range(1, cfg.max_level + 1):
        d = math.ceil(d / 2)
        dims[level] = d
    return [(dims[l], dims[l]) for l in
            range(cfg.min_level, cfg.max_level + 1)]


def effdet_anchors(cfg: EfficientDetConfig) -> np.ndarray:
    """Octave-scaled anchors for P3..P7 (the EfficientDet generator:
    base size = anchor_scale * stride, 3 octave scales per level)."""
    out = []
    for (fh, fw), level in zip(effdet_feature_shapes(cfg),
                               range(cfg.min_level, cfg.max_level + 1)):
        stride = cfg.input_size / fh
        y = (np.arange(fh, dtype=np.float32) + 0.5) * stride / cfg.input_size
        x = (np.arange(fw, dtype=np.float32) + 0.5) * stride / cfg.input_size
        ycenter, xcenter = np.meshgrid(y, x, indexing='ij')
        sizes = []
        for octave in range(cfg.num_scales):
            base = cfg.anchor_scale * stride * (2 ** (octave / cfg.num_scales))
            for aspect in cfg.aspect_ratios:
                h = base / math.sqrt(aspect) / cfg.input_size
                w = base * math.sqrt(aspect) / cfg.input_size
                sizes.append((h, w))
        heights = np.array([s[0] for s in sizes], np.float32)
        widths = np.array([s[1] for s in sizes], np.float32)
        yc = ycenter[..., None]
        xc = xcenter[..., None]
        h = heights[None, None, :]
        w = widths[None, None, :]
        boxes = np.stack([yc - 0.5 * h, xc - 0.5 * w,
                          yc + 0.5 * h, xc + 0.5 * w], axis=-1)
        out.append(boxes.reshape(-1, 4))
    return np.concatenate(out, axis=0)


class EffDetDetector(NamedTuple):
    model: EfficientDet
    config: EfficientDetConfig
    params: Any
    anchors: np.ndarray
    detect_batch: Any
    raw_apply: Any


def build_effdet(config: EfficientDetConfig = EfficientDetConfig(),
                 rng=None, params=None, anchors=None) -> EffDetDetector:
    """Same fused uint8-in -> detections-out contract as
    models/ssd.build_detector, so JaxDetectorBackend works unchanged."""
    cfg = config
    model = EfficientDet(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), cfg.dtype)
        params = model.init(rng, dummy, train=False)
    elif cfg.fused_heads and 'cls_head' in params.get('params', {}):
        # stored weights are always in the standard two-head layout;
        # the fused layout exists only inside the built detector
        params = fuse_dual_head_params(params, cfg)
    if anchors is None:
        anchors = effdet_anchors(cfg)
    else:
        anchors = np.asarray(anchors, np.float32)
        expected = effdet_anchors(cfg).shape
        if anchors.shape != expected:
            raise ValueError(
                f'anchor override shape {anchors.shape} does not match the '
                f'head geometry {expected} — the sidecar is stale or '
                f'belongs to a different model')
    anchors_dev = jnp.asarray(np.asarray(anchors, np.float32))

    def raw_native(p, images_f):
        return model.apply(p, images_f, train=False)

    def raw_apply(p, images_f):
        """f32 raw outputs — the contract parity tests/converters rely on."""
        b, l = raw_native(p, images_f)
        return b.astype(jnp.float32), l.astype(jnp.float32)

    from watsor_tpu.models.ssd import make_detect_batch
    # class column i is 1-based label i+1; with an explicit background
    # column the label columns start at 1 instead of 0
    detect_batch = make_detect_batch(
        cfg, anchors_dev, raw_native,
        lambda x: ((x - cfg.mean_rgb) / cfg.stddev_rgb).astype(cfg.dtype),
        background_offset=1 if cfg.explicit_background else 0)

    return EffDetDetector(model, cfg, params, np.asarray(anchors_dev),
                          detect_batch, raw_apply)
