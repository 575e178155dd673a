"""Model registry and weight loading.

The reference selects its backend by probing the model directory for
``edgetpu.tflite`` / ``gpu.trt`` / ``cpu.pb`` files
(/root/reference/watsor/detection/detector.py:40-50). Here the model
directory is probed for JAX weight files; when none exist the detector
runs with randomly-initialized weights (useful for benchmarks and the
synthetic-shape pipeline, useless for real cameras — a warning says so).

Weight formats:
  - ``<name>.msgpack`` — flax.serialization of the full variables tree
  - ``<name>.npz``     — flat dict of ``path/to/param`` -> array
"""

import logging
import os

import jax
import numpy as np

from watsor_tpu.models.ssd import SSDConfig, build_detector

_LOGGER = logging.getLogger(__name__)


def _build_effdet(config, rng=None, params=None, anchors=None):
    from watsor_tpu.models.efficientdet import build_effdet
    return build_effdet(config, rng=rng, params=params, anchors=anchors)


def _effdet_config(variant='lite0'):
    from watsor_tpu.models.efficientdet import lite_config
    return lite_config(variant)


# model stem -> (builder, config); configs for effdet are built lazily to
# keep the zoo import light
MODEL_REGISTRY = {
    'ssd_mobilenet_v2': (build_detector, SSDConfig()),
    'ssd_mobilenet_v1': (build_detector,
                         SSDConfig(backbone='mobilenet_v1')),
    'ssdlite_mobilenet_v2': (build_detector, SSDConfig(lite=True)),
    'ssd_inception_v2': (build_detector,
                         SSDConfig(backbone='inception_v2')),
    'ssd_mobilenet_v2_shapes': (build_detector, SSDConfig(num_classes=3)),
    'efficientdet_lite0': (_build_effdet, None),
}

DEFAULT_MODEL = 'ssd_mobilenet_v2'


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        node = tree
        parts = key.split('/')
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def flatten_params(tree, prefix=''):
    out = {}
    for key, value in tree.items():
        path = prefix + '/' + key if prefix else key
        if isinstance(value, dict):
            out.update(flatten_params(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def load_weights(model_path, name):
    """Returns a variables tree, or None if no weight file exists."""
    if not model_path:
        return None
    msgpack_file = os.path.join(model_path, name + '.msgpack')
    npz_file = os.path.join(model_path, name + '.npz')
    if os.path.exists(msgpack_file):
        from flax import serialization
        with open(msgpack_file, 'rb') as f:
            return serialization.msgpack_restore(f.read())
    if os.path.exists(npz_file):
        with np.load(npz_file) as data:
            return _unflatten({k: data[k] for k in data.files})
    return None


def save_weights(params, model_path, name):
    from flax import serialization
    os.makedirs(model_path, exist_ok=True)
    msgpack_file = os.path.join(model_path, name + '.msgpack')
    with open(msgpack_file, 'wb') as f:
        f.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, params)))
    return msgpack_file


def build_from_zoo(name=DEFAULT_MODEL, model_path=None, rng=None,
                   active_labels=None, dtype=None, nms_mode=None):
    """Build a detector, adopting stored weights when present.

    ``active_labels``: restrict post-processing to these 1-based labels
    (the union of every camera's watched classes) — the NMS class axis
    shrinks accordingly.
    ``dtype``: override the activation dtype (the reference's
    ``TRT_FLOAT_PRECISION=32|16`` knob, /root/reference/watsor/engine.py:25-26).
    ``nms_mode``: 'fused' (gather-free fast path) or 'exact' (greedy
    per-class parity mode), for configs that support it."""
    builder, config = MODEL_REGISTRY.get(name, (None, None))
    if builder is None:
        if name.startswith('efficientdet_'):
            builder = _build_effdet        # any lite variant (lite0/1/2)
        else:
            builder, config = build_detector, SSDConfig()
    if config is None and name.startswith('efficientdet_'):
        config = _effdet_config(name.split('_', 1)[1])
    if active_labels and hasattr(config, 'active_labels'):
        config = config._replace(active_labels=tuple(sorted(active_labels)))
    if dtype is not None and hasattr(config, 'dtype'):
        config = config._replace(dtype=dtype)
    if nms_mode is not None and hasattr(config, 'nms_mode'):
        config = config._replace(nms_mode=nms_mode)
    if os.environ.get('WATSOR_FUSED_HEADS') == '1' and \
            hasattr(config, 'fused_heads'):
        # EfficientDet HBM diet: run cls+box as one twice-wide head
        # (models/efficientdet._DualHead); weights fuse at build time
        config = config._replace(fused_heads=True)
    params = load_weights(model_path, name)
    anchors = None
    if isinstance(params, dict) and 'postprocess' in params:
        # TFLite conversions persist the source graph's exact anchor grid
        # and box-coder scales alongside the weights
        post = params.pop('postprocess')
        if post.get('anchors') is not None:
            anchors = np.asarray(post['anchors'], np.float32)
        if post.get('box_coder_scales') is not None and \
                hasattr(config, 'box_coder_scales'):
            config = config._replace(box_coder_scales=tuple(
                float(s) for s in np.asarray(post['box_coder_scales'])))
    if params is not None and hasattr(config, 'fpn_repeats'):
        # adopt the stored EfficientDet geometry (converted automl
        # checkpoints decide fpn/head shape and class count)
        try:
            tree = params['params']
            npc = config.anchors_per_cell
            ncls_total = int(np.asarray(
                tree['cls_head']['predict']['pw']['kernel']).shape[-1]) \
                // npc
            config = config._replace(
                fpn_channels=int(np.asarray(
                    tree['resample_p6']['Conv_0']['kernel']).shape[-1]),
                fpn_repeats=sum(1 for k in tree if k.startswith('bifpn')),
                head_repeats=sum(1 for k in tree['cls_head']
                                 if k.startswith('sep')),
                fpn_weight_method=('fastattn' if 'WSM' in
                                   tree['bifpn0']['fnode0'] else 'sum'),
                num_classes=ncls_total - (1 if config.explicit_background
                                          else 0))
        except (KeyError, TypeError, IndexError):
            pass
    if params is not None and hasattr(config, 'head_kernel'):
        # adopt the stored weights' predictor geometry: conv size (public
        # v2 checkpoints use 3x3 heads, v1 1x1) and SSDLite separable heads
        try:
            tree = params['params']
            stored_lite = 'box_head0_dw' in tree
            if hasattr(config, 'lite') and config.lite != stored_lite:
                # weights decide (both directions: plain weights under a
                # lite name and vice versa must still apply cleanly)
                config = config._replace(lite=stored_lite)
            if stored_lite:
                k = int(np.asarray(tree['box_head0_dw']['Conv_0']
                                   ['kernel']).shape[0])
            else:
                k = int(np.asarray(tree['box_head0']['kernel']).shape[0])
            if k != config.head_kernel:
                config = config._replace(head_kernel=k)
            from watsor_tpu.ops.anchors import anchors_per_location
            npl = anchors_per_location(config.anchor_spec)
            ncls = int(np.asarray(tree['cls_head0']['bias']).size) \
                // npl[0] - 1
            if ncls != config.num_classes:
                config = config._replace(num_classes=ncls)
        except (KeyError, TypeError, IndexError):
            pass
    if params is None:
        _LOGGER.warning(
            "No weights for '%s' under %s — using random initialization "
            "(fine for benchmarks/synthetic shapes, not for real cameras)",
            name, model_path)
    return builder(config, rng=rng, params=params, anchors=anchors)
