"""SSD meta-architecture (Flax): feature pyramid + conv heads + the fused
post-processing (box decode → class-aware NMS) that the reference gets from
its frozen graphs / TensorRT NMS plugin
(/root/reference/watsor/detection/tensorrt_gpu.py:184-188).

The public contract matches the reference's detector backends bit-for-bit:
``detect_batch`` returns boxes (normalized, clamped to [0,1]), scores, and
1-based class labels (the reference's ``label = class + 1`` offset,
edge_tpu.py:49, tensorflow_lite_cpu.py:44), padded to a static
``max_detections`` with a valid-count — static shapes all the way so the
whole step is one XLA program on the MXU.
"""

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.models.mobilenet_v2 import MobileNetV2Backbone, ConvBNRelu6
from watsor_tpu.ops.anchors import AnchorSpec, anchors_per_location, \
    ssd300_feature_shapes, ssd_anchors
from watsor_tpu.ops.boxes import decode_boxes
from watsor_tpu.ops.nms import (batched_class_aware_nms,
                                batched_class_aware_nms_fused_late)
from watsor_tpu.ops.preprocess import resize_bilinear_mxu


class SSDConfig(NamedTuple):
    num_classes: int = 90          # foreground classes (COCO)
    input_size: int = 300
    # 'mobilenet_v2' (default), 'mobilenet_v1' or 'inception_v2' — the
    # three SSD families of the reference's model table
    # (/root/reference/README.md:446-450)
    backbone: str = 'mobilenet_v2'
    # box/class predictor conv size: the public v2 checkpoint uses 3x3,
    # the public v1 checkpoint 1x1 (TF-OD pipeline `kernel_size`); the
    # converter infers it from the checkpoint's head weight shapes
    head_kernel: int = 3
    # SSDLite (use_depthwise in the TF-OD configs, e.g. the public
    # ssdlite_mobilenet_v2_coco checkpoint): separable 3x3 convs in the
    # extras' second stage and in the predictors
    lite: bool = False
    width_multiplier: float = 1.0
    extra_features: Tuple[int, ...] = (512, 256, 256, 128)
    anchor_spec: AnchorSpec = AnchorSpec()
    # faster_rcnn box-coder scales (y, x, h, w); TFLite conversions adopt
    # the scales stored in the graph's detection-postprocess options
    box_coder_scales: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    iou_threshold: float = 0.6
    score_threshold: float = 0.005
    max_detections: int = 100
    # 'fused' = gather-free union NMS (the TPU fast path, ~4.5x quicker
    # post stage); 'exact' = classic per-class greedy (parity reference)
    nms_mode: str = 'fused'
    # restrict post-processing to these 1-based labels (None = all): a
    # deployment watching {person, car} pays for 2 classes, not 90 —
    # the config's detect lists define this set (main.py wires it)
    active_labels: Any = None
    dtype: Any = jnp.bfloat16


class SSD(nn.Module):
    """Feature extractor + box/class conv heads.

    ``__call__`` returns raw predictions:
      box_encodings  [B, A, 4]
      class_logits   [B, A, num_classes + 1]  (index 0 = background)
    """

    config: SSDConfig = SSDConfig()

    @nn.compact
    def __call__(self, images, train=False):
        cfg = self.config
        if cfg.backbone == 'mobilenet_v1':
            from watsor_tpu.models.mobilenet_v1 import MobileNetV1Backbone
            backbone = MobileNetV1Backbone(cfg.width_multiplier,
                                           dtype=cfg.dtype, name='backbone')
        elif cfg.backbone == 'inception_v2':
            from watsor_tpu.models.inception_v2 import InceptionV2Backbone
            backbone = InceptionV2Backbone(dtype=cfg.dtype, name='backbone')
        else:
            backbone = MobileNetV2Backbone(cfg.width_multiplier,
                                           dtype=cfg.dtype, name='backbone')
        c4, c5 = backbone(images, train)
        features = [c4, c5]
        x = c5
        for i, ch in enumerate(cfg.extra_features):
            x = ConvBNRelu6(ch // 2, (1, 1), dtype=cfg.dtype,
                            name=f'extra{i}_pw')(x, train)
            if cfg.lite:
                # separable 3x3 s2: depthwise + pointwise (SSDLite extras)
                x = ConvBNRelu6(x.shape[-1], (3, 3), strides=2,
                                groups=x.shape[-1], dtype=cfg.dtype,
                                name=f'extra{i}_dw')(x, train)
                x = ConvBNRelu6(ch, (1, 1), dtype=cfg.dtype,
                                name=f'extra{i}')(x, train)
            else:
                x = ConvBNRelu6(ch, (3, 3), strides=2, dtype=cfg.dtype,
                                name=f'extra{i}')(x, train)
            features.append(x)

        npl = anchors_per_location(cfg.anchor_spec)
        assert len(features) == len(npl)
        box_out, cls_out = [], []
        num_cls = cfg.num_classes + 1
        hk = (cfg.head_kernel, cfg.head_kernel)
        for i, (feat, n) in enumerate(zip(features, npl)):
            bf, cf = feat, feat
            if cfg.lite:
                # SSDLite predictors: depthwise 3x3 (BN+relu6) feeding a
                # 1x1 linear conv with bias
                bf = ConvBNRelu6(feat.shape[-1], hk, groups=feat.shape[-1],
                                 dtype=cfg.dtype,
                                 name=f'box_head{i}_dw')(feat, train)
                cf = ConvBNRelu6(feat.shape[-1], hk, groups=feat.shape[-1],
                                 dtype=cfg.dtype,
                                 name=f'cls_head{i}_dw')(feat, train)
                hk_out = (1, 1)
            else:
                hk_out = hk
            b = nn.Conv(n * 4, hk_out, padding='SAME', dtype=cfg.dtype,
                        name=f'box_head{i}')(bf)
            c = nn.Conv(n * num_cls, hk_out, padding='SAME', dtype=cfg.dtype,
                        name=f'cls_head{i}')(cf)
            B = feat.shape[0]
            box_out.append(b.reshape(B, -1, 4))
            cls_out.append(c.reshape(B, -1, num_cls))
        return (jnp.concatenate(box_out, axis=1).astype(jnp.float32),
                jnp.concatenate(cls_out, axis=1).astype(jnp.float32))


def feature_map_shapes(cfg: SSDConfig):
    return ssd300_feature_shapes(cfg.input_size)


def anchors_for(cfg: SSDConfig) -> np.ndarray:
    return ssd_anchors(feature_map_shapes(cfg), cfg.anchor_spec)


class Detector(NamedTuple):
    """A built detector: params + the jitted batched detection step."""

    model: SSD
    config: SSDConfig
    params: Any
    anchors: np.ndarray
    detect_batch: Any          # (images_u8 [B,H,W,3]) -> DetectionsBatch
    raw_apply: Any             # (params, images_f [B,S,S,3]) -> (boxes, logits)


class DetectionsBatch(NamedTuple):
    boxes: jnp.ndarray         # [B, N, 4] normalized ymin/xmin/ymax/xmax
    scores: jnp.ndarray        # [B, N]
    classes: jnp.ndarray       # [B, N] int32 1-based labels, 0 = padding
    valid: jnp.ndarray         # [B] int32


def build_detector(config: SSDConfig = SSDConfig(), rng=None,
                   params=None, anchors=None) -> Detector:
    """Construct the model, initialize (or adopt) params, and jit the fused
    uint8-in → detections-out step.

    The step accepts frames at ANY fixed resolution: resize to the model
    input runs on device as MXU contractions (ops/preprocess.py), fused with
    normalization and the first conv — the host never touches pixels.

    ``anchors``: optional [A, 4] corner-form override — TFLite conversions
    carry the exact grid stored in the source graph's postprocess op.
    """
    cfg = config
    model = SSD(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), cfg.dtype)
        variables = model.init(rng, dummy, train=False)
        params = variables
    if anchors is None:
        anchors = anchors_for(cfg)
    else:
        anchors = np.asarray(anchors, np.float32)
        expected = anchors_for(cfg).shape
        if anchors.shape != expected:
            raise ValueError(
                f'anchor override shape {anchors.shape} does not match the '
                f'head geometry {expected} — the postprocess sidecar is '
                f'stale or belongs to a different model')
    anchors_dev = jnp.asarray(anchors)

    def raw_apply(p, images_f):
        return model.apply(p, images_f, train=False)

    def normalize(x):
        return (x * (2.0 / 255.0) - 1.0).astype(cfg.dtype)

    detect_batch = make_detect_batch(cfg, anchors_dev, raw_apply, normalize)
    return Detector(model, cfg, params, anchors, detect_batch, raw_apply)


def active_label_array(cfg):
    """The sorted watched-label vector (or None = all classes)."""
    if cfg.active_labels is None:
        return None
    return jnp.asarray(sorted(set(int(l) for l in cfg.active_labels
                                  if 0 < int(l) <= cfg.num_classes)),
                       jnp.int32)


def make_detect_batch(cfg, anchors_dev, raw_apply, normalize,
                      background_offset=1):
    """The ONE fused uint8-in -> detections-out postprocess every detector
    family shares (float SSD, fused-block, int8, EfficientDet): device
    resize -> ``normalize`` -> ``raw_apply`` -> box decode -> active-label
    slice -> sigmoid -> class-aware NMS -> 1-based label remap.

    ``background_offset``: logits column of label 1. SSD heads carry a
    background column at 0 (offset 1); EfficientDet-Lite has none
    (offset 0) unless ``explicit_background``."""
    active = active_label_array(cfg)

    fused_suppression = {'fused': 'fast', 'fused_exact': 'greedy',
                         'fused_exact_pallas': 'greedy_pallas'} \
        .get(cfg.nms_mode)

    @jax.jit
    def detect_batch(p, images_u8):
        x = resize_bilinear_mxu(images_u8, cfg.input_size, cfg.input_size,
                                dtype=jnp.float32)
        x = normalize(x)
        box_enc, logits = raw_apply(p, x)
        # ``logits`` may arrive in the model's native dtype — at
        # EfficientDet-Lite4 scale the [B, 76725, 90] tensor is ~900
        # MB/step in f32 vs half that in bf16, and the NMS union top-k
        # only needs ordering, which any dtype preserves of its own
        # values. The tiny NMS outputs cast back to f32 below.
        if active is not None:
            # slice the head to the watched classes: the NMS class axis
            # shrinks from num_classes to len(active)
            cls_logits = logits[..., active - 1 + background_offset]
        else:
            cls_logits = logits[..., background_offset:]
        if fused_suppression is not None:
            # late materialization: rank the candidate union on raw
            # max-class logits (sigmoid is monotonic), then decode +
            # sigmoid only the M=128 survivors — never builds the full
            # [B, A, 4] f32 box tensor or [B, A, C] score tensor.
            # Bitwise-identical outputs (decode/sigmoid are elementwise).
            b, s, c, v = batched_class_aware_nms_fused_late(
                box_enc, cls_logits, anchors_dev,
                scales=tuple(cfg.box_coder_scales),
                iou_threshold=cfg.iou_threshold,
                score_threshold=cfg.score_threshold,
                max_detections=cfg.max_detections,
                suppression=fused_suppression)
        else:
            # classic per-class formulations need every anchor decoded
            # (boxes in f32 — pixel accuracy needs it; [B, A, 4] is small)
            # and f32 scores: the pallas kernel swaps into f32 refs, and
            # exact/fast would otherwise quantize reported scores to the
            # model's native bf16
            boxes = decode_boxes(box_enc.astype(jnp.float32), anchors_dev,
                                 scales=cfg.box_coder_scales)
            scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
            b, s, c, v = batched_class_aware_nms(
                boxes, scores,
                iou_threshold=cfg.iou_threshold,
                score_threshold=cfg.score_threshold,
                max_detections=cfg.max_detections,
                mode=cfg.nms_mode)
        if active is not None:
            # map compacted class indices back to 1-based COCO labels
            c = jnp.where(c > 0, active[jnp.maximum(c - 1, 0)], 0)
        return DetectionsBatch(b.astype(jnp.float32),
                               s.astype(jnp.float32), c, v)

    return detect_batch
