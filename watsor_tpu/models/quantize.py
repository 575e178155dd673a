"""Weight quantization: per-channel symmetric int8 for conv kernels.

The reference reaches int8 through the EdgeTPU compiler's full-graph
quantization (opaque, inside the .tflite). Here quantization is a
first-class transform on the params pytree: kernels are stored int8 with a
per-output-channel scale and dequantized inside the jitted step — XLA fuses
the dequant multiply into the convolution, so HBM weight traffic halves
versus bf16 while the MXU still sees its preferred formats.

`quantize_params` / `dequantize_params` round-trip any Flax variables tree;
only 4-D conv kernels are quantized (biases, BN stats and fusion weights
stay float — they are tiny).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedLeaf(NamedTuple):
    """An int8 tensor + its per-output-channel dequant scale."""

    values: Any      # int8, original shape
    scales: Any      # float32, [out_channels]


def _is_conv_kernel(path, leaf):
    name = path[-1].key if path and hasattr(path[-1], 'key') else ''
    return name == 'kernel' and getattr(leaf, 'ndim', 0) == 4


def quantize_params(params):
    """variables tree -> tree with conv kernels replaced by QuantizedLeaf."""

    def quantize(path, leaf):
        if not _is_conv_kernel(path, leaf):
            return leaf
        kernel = np.asarray(leaf, np.float32)
        # per-output-channel symmetric scale (last axis = out channels)
        absmax = np.abs(kernel).reshape(-1, kernel.shape[-1]).max(axis=0)
        scales = (absmax / 127.0).astype(np.float32)
        scales = np.where(scales == 0.0, 1.0, scales)
        q = np.clip(np.round(kernel / scales), -127, 127).astype(np.int8)
        return QuantizedLeaf(jnp.asarray(q), jnp.asarray(scales))

    return jax.tree_util.tree_map_with_path(
        quantize, params, is_leaf=lambda x: isinstance(x, QuantizedLeaf))


def dequantize_params(params, dtype=jnp.bfloat16):
    """Inverse transform; runs inside jit so XLA fuses the multiply."""

    def dequantize(leaf):
        if isinstance(leaf, QuantizedLeaf):
            return (leaf.values.astype(dtype) *
                    leaf.scales.astype(dtype))
        return leaf

    return jax.tree_util.tree_map(
        dequantize, params, is_leaf=lambda x: isinstance(x, QuantizedLeaf))


def quantization_error(params):
    """Max relative error per quantized kernel (diagnostics)."""
    errors = {}

    def visit(path, leaf):
        if _is_conv_kernel(path, leaf):
            quantized = quantize_params({'x': leaf})['x']
            restored = np.asarray(quantized.values, np.float32) * \
                np.asarray(quantized.scales)
            kernel = np.asarray(leaf, np.float32)
            denom = np.abs(kernel).max() or 1.0
            key = '/'.join(str(getattr(p, 'key', p)) for p in path)
            errors[key] = float(np.abs(restored - kernel).max() / denom)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return errors


def build_quantized_detector(config=None, rng=None, params=None):
    """SSD detector whose weights live in HBM as int8 (+ scales); the
    jitted step dequantizes to bf16 on the fly."""
    from watsor_tpu.models.ssd import DetectionsBatch, SSDConfig, \
        build_detector

    base = build_detector(config or SSDConfig(), rng=rng, params=params)
    q_params = quantize_params(base.params)
    cfg = base.config
    inner = base.detect_batch

    @jax.jit
    def detect_batch(qp, images_u8):
        return inner(dequantize_params(qp, cfg.dtype), images_u8)

    return base._replace(params=q_params, detect_batch=detect_batch)
