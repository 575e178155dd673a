"""EfficientNet-Lite backbone (Flax).

Clean re-implementation of the published EfficientNet-Lite design
(arXiv:1905.11946 + the Lite modifications: no squeeze-excite, ReLU6
instead of swish, stem/head widths unscaled) — the feature extractor behind
the EfficientDet-Lite checkpoints the reference can serve through TFLite
(/root/reference/watsor/detection/tensorflow_lite_cpu.py drives such
graphs; the architecture lives inside the flatbuffer).

NHWC, bf16-friendly, depthwise via feature_group_count — same TPU layout
conventions as the MobileNetV2 backbone.
"""

import math
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _round_filters(filters, width_multiplier, divisor=8):
    filters *= width_multiplier
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def _round_repeats(repeats, depth_multiplier):
    return int(math.ceil(depth_multiplier * repeats))


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding='SAME', use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class MBConvLite(nn.Module):
    """Mobile inverted bottleneck without squeeze-excite (the Lite cut)."""

    features: int
    kernel: Tuple[int, int]
    strides: int
    expand_ratio: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        in_features = x.shape[-1]
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(in_features * self.expand_ratio, (1, 1),
                       dtype=self.dtype, name='expand')(y, train)
        y = ConvBN(y.shape[-1], self.kernel, strides=self.strides,
                   groups=y.shape[-1], dtype=self.dtype,
                   name='depthwise')(y, train)
        y = ConvBN(self.features, (1, 1), act=False, dtype=self.dtype,
                   name='project')(y, train)
        if self.strides == 1 and in_features == self.features:
            y = y + x
        return y


# (expand, features, repeats, first_stride, kernel) — the B0 block table
EFFNET_B0_BLOCKS = (
    (1, 16, 1, 1, (3, 3)),
    (6, 24, 2, 2, (3, 3)),
    (6, 40, 2, 2, (5, 5)),
    (6, 80, 3, 2, (3, 3)),
    (6, 112, 3, 1, (5, 5)),
    (6, 192, 4, 2, (5, 5)),
    (6, 320, 1, 1, (3, 3)),
)

# (width, depth) multipliers per lite variant
LITE_SCALING = {
    'lite0': (1.0, 1.0),
    'lite1': (1.0, 1.1),
    'lite2': (1.1, 1.2),
    'lite3': (1.2, 1.4),
    'lite4': (1.4, 1.8),
}


def lite_block_args(variant):
    """The flat per-block argument table for a lite variant:
    [(expand_ratio, features, strides, kernel, stage), ...] — one entry per
    MBConv block in execution order. This is the single source of truth for
    both the Flax backbone below and the automl-checkpoint converter
    (models/convert_effdet.py), whose ``blocks_{i}`` variable scopes use the
    same flat numbering."""
    width, depth = LITE_SCALING[variant]
    args = []
    for stage, (expand, features, repeats, first_stride, kernel) in \
            enumerate(EFFNET_B0_BLOCKS):
        features = _round_filters(features, width)
        # Lite: first and last stage repeats are NOT depth-scaled
        if stage not in (0, len(EFFNET_B0_BLOCKS) - 1):
            repeats = _round_repeats(repeats, depth)
        for i in range(repeats):
            args.append((expand, features, first_stride if i == 0 else 1,
                         kernel, stage))
    return args


class EfficientNetLite(nn.Module):
    """Returns the stride-8/16/32 feature taps (C3, C4, C5)."""

    variant: str = 'lite0'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        # Lite: stem is NOT width-scaled
        x = ConvBN(32, (3, 3), strides=2, dtype=self.dtype,
                   name='stem')(x, train)
        taps = {}
        block_args = lite_block_args(self.variant)
        for block_index, (expand, features, strides, kernel, stage) in \
                enumerate(block_args):
            x = MBConvLite(features, kernel, strides, expand,
                           dtype=self.dtype,
                           name=f'block{block_index}')(x, train)
            last_of_stage = (block_index + 1 == len(block_args) or
                             block_args[block_index + 1][4] != stage)
            if last_of_stage and stage == 2:
                taps['C3'] = x          # stride 8
            elif last_of_stage and stage == 4:
                taps['C4'] = x          # stride 16
            elif last_of_stage and stage == 6:
                taps['C5'] = x          # stride 32
        return taps['C3'], taps['C4'], taps['C5']
