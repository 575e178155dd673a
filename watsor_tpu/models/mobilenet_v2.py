"""MobileNetV2 backbone (Flax) — the feature extractor behind the
SSD-MobileNet checkpoints the reference serves via EdgeTPU/TensorRT/TF
(/root/reference/watsor/detection/*.py drive those graphs; the architecture
itself lives inside the checkpoints, so this is a clean re-implementation of
the published MobileNetV2 design, arXiv:1801.04381).

TPU notes: NHWC layout end-to-end, bf16 activations by default, depthwise
convs via ``feature_group_count`` (XLA lowers them onto the VPU; the 1×1
expand/project convs are MXU matmuls and dominate FLOPs). BatchNorm is kept
as a separate layer so the training step works; at inference XLA constant-
folds scale/shift into the conv weights.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:  # never round down by more than 10%
        new_v += divisor
    return new_v


class ConvBNRelu6(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    groups: int = 1
    use_relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding='SAME', use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype)(x)
        if self.use_relu:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBNRelu6(hidden, (1, 1), dtype=self.dtype,
                            name='expand')(y, train)
        y = ConvBNRelu6(hidden, (3, 3), strides=self.strides, groups=hidden,
                        dtype=self.dtype, name='depthwise')(y, train)
        y = ConvBNRelu6(self.features, (1, 1), use_relu=False,
                        dtype=self.dtype, name='project')(y, train)
        if self.strides == 1 and in_features == self.features:
            y = y + x
        return y


# (expand_ratio, features, repeats, first_stride)
MOBILENET_V2_BLOCKS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2Backbone(nn.Module):
    """Returns the two SSD feature taps: the layer-13 expansion output
    (stride 16, 576 ch at width 1.0) and the final 1280-ch stride-32 map —
    the same taps the TF OD API uses for ssd_mobilenet_v2."""

    width_multiplier: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        wm = self.width_multiplier
        x = ConvBNRelu6(_make_divisible(32 * wm), (3, 3), strides=2,
                        dtype=self.dtype, name='stem')(x, train)
        tap_c4 = None
        block_index = 0
        for expand, features, repeats, first_stride in MOBILENET_V2_BLOCKS:
            features = _make_divisible(features * wm)
            for i in range(repeats):
                strides = first_stride if i == 0 else 1
                # C4 tap: the *expansion* (not output) of the first stride-2
                # block at stride 16 — i.e. block 13's expanded features.
                if block_index == 13:
                    y = ConvBNRelu6(x.shape[-1] * expand, (1, 1),
                                    dtype=self.dtype,
                                    name=f'block{block_index}_expand')(x, train)
                    tap_c4 = y
                    y = ConvBNRelu6(x.shape[-1] * expand, (3, 3),
                                    strides=strides,
                                    groups=x.shape[-1] * expand,
                                    dtype=self.dtype,
                                    name=f'block{block_index}_depthwise')(y, train)
                    y = ConvBNRelu6(features, (1, 1), use_relu=False,
                                    dtype=self.dtype,
                                    name=f'block{block_index}_project')(y, train)
                    x = y
                else:
                    x = InvertedResidual(features, strides, expand,
                                         dtype=self.dtype,
                                         name=f'block{block_index}')(x, train)
                block_index += 1
        head_features = _make_divisible(1280 * max(wm, 1.0))
        x = ConvBNRelu6(head_features, (1, 1), dtype=self.dtype,
                        name='head')(x, train)
        return tap_c4, x
