"""EfficientDet-Lite detector (Flax): EfficientNet-Lite backbone + BiFPN +
shared separable-conv heads, with the same fused post-processing contract
as the SSD family (decode + class-aware NMS on device, boxes/scores/
1-based classes padded to a static max — see models/ssd.py).

Clean re-implementation of the published EfficientDet design
(arXiv:1911.09070) with the Lite simplifications (ReLU6, no SE). The
reference serves such models only as opaque TFLite flatbuffers
(/root/reference/watsor/detection/tensorflow_lite_cpu.py); here the
architecture is first-class and jit-compiles into one XLA program.
"""

import math
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
# variant -> (input_size, fpn_channels, fpn_repeats, head_repeats)
LITE_DET_SCALING = {
    'lite0': (320, 64, 3, 3),
    'lite1': (384, 88, 4, 3),
    'lite2': (448, 112, 5, 3),
    'lite3': (512, 160, 6, 4),
    'lite4': (640, 224, 7, 4),
}


def lite_config(variant='lite0', **overrides):
    """EfficientDetConfig with the published per-variant scaling."""
    if variant not in LITE_DET_SCALING:
        raise ValueError(
            'unknown EfficientDet-Lite variant {!r}; supported: {}'.format(
                variant, ', '.join(sorted(LITE_DET_SCALING))))
    size, channels, fpn_r, head_r = LITE_DET_SCALING[variant]
    return EfficientDetConfig(variant=variant, input_size=size,
                              fpn_channels=channels, fpn_repeats=fpn_r,
                              head_repeats=head_r)._replace(**overrides)


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
    anchor_scale: float = 3.0      # lite0 uses 3.0 (4.0 for the full models)
    iou_threshold: float = 0.6
    score_threshold: float = 0.005
    max_detections: int = 100
    box_coder_scales: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    nms_mode: str = 'fused'
    active_labels: Any = None      # restrict post-processing (see SSDConfig)
    dtype: Any = jnp.bfloat16

    @property
    def num_levels(self):
        return self.max_level - self.min_level + 1

    @property
    def anchors_per_cell(self):
        return self.num_scales * len(self.aspect_ratios)


class SeparableConvBN(nn.Module):
    features: int
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(x.shape[-1], (3, 3), padding='SAME', use_bias=False,
                    feature_group_count=x.shape[-1], dtype=self.dtype,
                    name='dw')(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='pw')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


def _resize_to(x, h, w):
    """Nearest up/box down sampling between pyramid levels."""
    B, xh, xw, C = x.shape
    if xh == h and xw == w:
        return x
    if xh < h:  # upsample — nearest
        return jax.image.resize(x, (B, h, w, C), method='nearest')
    # downsample: stride-2 max pool
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')


class _Fuse(nn.Module):
    """Fast-attention weighted fusion + separable conv."""

    features: int
    num_inputs: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs, train=False):
        w = self.param('fusion_weights', nn.initializers.ones,
                       (self.num_inputs,))
        w = nn.relu(w)
        w = w / (jnp.sum(w) + 1e-4)
        x = sum(w[i].astype(inputs[0].dtype) * inputs[i]
                for i in range(self.num_inputs))
        return SeparableConvBN(self.features, dtype=self.dtype,
                               name='conv')(x, train)


class BiFPN(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train=False):
        """feats: list of 5 maps P3..P7 (already at fpn channels)."""
        p3, p4, p5, p6, p7 = feats
        shapes = [f.shape[1:3] for f in feats]

        def up(x, target):
            return _resize_to(x, *target)

        def down(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')

        c = self.channels
        p6td = _Fuse(c, 2, dtype=self.dtype, name='p6td')(
            [p6, up(p7, shapes[3])], train)
        p5td = _Fuse(c, 2, dtype=self.dtype, name='p5td')(
            [p5, up(p6td, shapes[2])], train)
        p4td = _Fuse(c, 2, dtype=self.dtype, name='p4td')(
            [p4, up(p5td, shapes[1])], train)
        p3out = _Fuse(c, 2, dtype=self.dtype, name='p3out')(
            [p3, up(p4td, shapes[0])], train)
        p4out = _Fuse(c, 3, dtype=self.dtype, name='p4out')(
            [p4, p4td, down(p3out)], train)
        p5out = _Fuse(c, 3, dtype=self.dtype, name='p5out')(
            [p5, p5td, down(p4out)], train)
        p6out = _Fuse(c, 3, dtype=self.dtype, name='p6out')(
            [p6, p6td, down(p5out)], train)
        p7out = _Fuse(c, 2, dtype=self.dtype, name='p7out')(
            [p7, down(p6out)], train)
        return [p3out, p4out, p5out, p6out, p7out]


class _Head(nn.Module):
    """Separable-conv head with weights shared across levels but per-level
    BatchNorm (the EfficientDet convention)."""

    out_features: int
    repeats: int
    channels: int
    num_levels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train=False):
        outputs = []
        convs = [
            (nn.Conv(self.channels, (3, 3), padding='SAME', use_bias=False,
                     feature_group_count=self.channels, dtype=self.dtype,
                     name=f'dw{r}'),
             nn.Conv(self.channels, (1, 1), use_bias=False,
                     dtype=self.dtype, name=f'pw{r}'))
            for r in range(self.repeats)
        ]
        final = nn.Conv(self.out_features, (3, 3), padding='SAME',
                        dtype=self.dtype, name='predict')
        for level, x in enumerate(feats):
            for r, (dw, pw) in enumerate(convs):
                x = pw(dw(x))
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype,
                                 name=f'bn{r}_l{level}')(x)
                x = jnp.minimum(nn.relu(x), 6.0)
            outputs.append(final(x))
        return outputs


class EfficientDet(nn.Module):
    config: EfficientDetConfig = EfficientDetConfig()

    @nn.compact
    def __call__(self, images, train=False):
        cfg = self.config
        c3, c4, c5 = EfficientNetLite(cfg.variant, dtype=cfg.dtype,
                                      name='backbone')(images, train)
        # lateral 1x1 projections + extra levels P6, P7
        proj = [ConvBN(cfg.fpn_channels, (1, 1), act=False, dtype=cfg.dtype,
                       name=f'lateral{i}')(c, train)
                for i, c in enumerate((c3, c4, c5))]
        p6 = nn.max_pool(ConvBN(cfg.fpn_channels, (1, 1), act=False,
                                dtype=cfg.dtype, name='p6_proj')(c5, train),
                         (3, 3), strides=(2, 2), padding='SAME')
        p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding='SAME')
        feats = proj + [p6, p7]

        for r in range(cfg.fpn_repeats):
            feats = BiFPN(cfg.fpn_channels, dtype=cfg.dtype,
                          name=f'bifpn{r}')(feats, train)

        num_anchors = cfg.anchors_per_cell
        num_cls = cfg.num_classes + 1
        cls_outputs = _Head(num_anchors * num_cls, cfg.head_repeats,
                            cfg.fpn_channels, cfg.num_levels,
                            dtype=cfg.dtype, name='cls_head')(feats, train)
        box_outputs = _Head(num_anchors * 4, cfg.head_repeats,
                            cfg.fpn_channels, cfg.num_levels,
                            dtype=cfg.dtype, name='box_head')(feats, train)
        B = images.shape[0]
        boxes = jnp.concatenate(
            [b.reshape(B, -1, 4) for b in box_outputs], axis=1)
        logits = jnp.concatenate(
            [c.reshape(B, -1, num_cls) for c in cls_outputs], axis=1)
        return boxes.astype(jnp.float32), logits.astype(jnp.float32)


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
                 rng=None, params=None) -> EffDetDetector:
    """Same fused uint8-in -> detections-out contract as
    models/ssd.build_detector, so JaxDetectorBackend works unchanged."""
    cfg = config
    model = EfficientDet(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), cfg.dtype)
        params = model.init(rng, dummy, train=False)
    anchors_dev = jnp.asarray(effdet_anchors(cfg))
    active = None
    if cfg.active_labels is not None:
        active = jnp.asarray(sorted(set(int(l) for l in cfg.active_labels
                                        if 0 < int(l) <= cfg.num_classes)),
                             jnp.int32)

    def raw_apply(p, images_f):
        return model.apply(p, images_f, train=False)

    @jax.jit
    def detect_batch(p, images_u8):
        x = resize_bilinear_mxu(images_u8, cfg.input_size, cfg.input_size,
                                dtype=jnp.float32)
        x = (x * (2.0 / 255.0) - 1.0).astype(cfg.dtype)
        box_enc, logits = model.apply(p, x, train=False)
        boxes = decode_boxes(box_enc, anchors_dev,
                             scales=cfg.box_coder_scales)
        if active is not None:
            scores = jax.nn.sigmoid(logits[..., active])
        else:
            scores = jax.nn.sigmoid(logits[..., 1:])
        b, s, c, v = batched_class_aware_nms(
            boxes, scores,
            iou_threshold=cfg.iou_threshold,
            score_threshold=cfg.score_threshold,
            max_detections=cfg.max_detections,
            mode=cfg.nms_mode)
        if active is not None:
            c = jnp.where(c > 0, active[jnp.maximum(c - 1, 0)], 0)
        from watsor_tpu.models.ssd import DetectionsBatch
        return DetectionsBatch(b, s, c, v)

    return EffDetDetector(model, cfg, params, np.asarray(anchors_dev),
                          detect_batch, raw_apply)
