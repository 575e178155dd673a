"""InceptionV2 (BN-Inception) backbone (Flax) — the third SSD family the
reference's model table documents: its ``gpu.uff``/``cpu.pb`` columns list
SSD-Inception-v2 as the accuracy pick next to MobileNet v1/v2
(/root/reference/README.md:446-450, ssd_inception_v2_coco_2018_01_28).

Clean re-implementation of the published Inception-with-BN design
(arXiv:1502.03167) in the exact geometry of tf-slim's ``inception_v2``
as used by the TF-OD-API ``ssd_inception_v2`` feature extractor: a
separable 7x7 stem, Mixed_3b..Mixed_5c inception blocks, and the two SSD
taps Mixed_4c (19x19x576 at 300 input) and Mixed_5c (10x10x1024). The
stock detection config overrides the base hyperparams with RELU_6 +
BatchNorm(eps 1e-3), so every unit is the same ConvBNRelu6 the other
backbones use.

TPU notes: branches are independent conv pipelines XLA schedules in
parallel; the 1x1 branch convs are MXU matmuls. NHWC, bf16 by default.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from watsor_tpu.models.mobilenet_v2 import ConvBNRelu6


class SeparableStem(nn.Module):
    """slim ``Conv2d_1a_7x7``: separable 7x7 stride 2 (depth_multiplier 8
    -> 24 depthwise channels), ONE BatchNorm + relu6 on the pointwise
    output (slim applies normalization once per separable_conv2d)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(24, (7, 7), strides=2, padding='SAME', use_bias=False,
                    feature_group_count=3, dtype=self.dtype, name='dw')(x)
        x = nn.Conv(64, (1, 1), use_bias=False, dtype=self.dtype,
                    name='pw')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class Mixed(nn.Module):
    """Standard inception block: 1x1 | 1x1-3x3 | 1x1-3x3-3x3 | pool-1x1,
    concatenated in branch order (slim Branch_0..Branch_3)."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int, int]
    b3: int
    pool: str = 'avg'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        conv = lambda ch, k, name: ConvBNRelu6(ch, k, dtype=self.dtype,
                                               name=name)
        y0 = conv(self.b0, (1, 1), 'b0')(x, train)
        y1 = conv(self.b1[0], (1, 1), 'b1_0')(x, train)
        y1 = conv(self.b1[1], (3, 3), 'b1_1')(y1, train)
        y2 = conv(self.b2[0], (1, 1), 'b2_0')(x, train)
        y2 = conv(self.b2[1], (3, 3), 'b2_1')(y2, train)
        y2 = conv(self.b2[2], (3, 3), 'b2_2')(y2, train)
        if self.pool == 'max':
            y3 = nn.max_pool(x, (3, 3), strides=(1, 1), padding='SAME')
        else:
            # TF avg_pool excludes the padding from the divisor
            y3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding='SAME',
                             count_include_pad=False)
        y3 = conv(self.b3, (1, 1), 'b3')(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


class MixedReduction(nn.Module):
    """Stride-2 inception block (Mixed_4a / Mixed_5a): 1x1-3x3s2 |
    1x1-3x3-3x3s2 | maxpool-s2, concatenated."""

    b0: Tuple[int, int]
    b1: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        conv = lambda ch, k, s, name: ConvBNRelu6(
            ch, k, strides=s, dtype=self.dtype, name=name)
        y0 = conv(self.b0[0], (1, 1), 1, 'b0_0')(x, train)
        y0 = conv(self.b0[1], (3, 3), 2, 'b0_1')(y0, train)
        y1 = conv(self.b1[0], (1, 1), 1, 'b1_0')(x, train)
        y1 = conv(self.b1[1], (3, 3), 1, 'b1_1')(y1, train)
        y1 = conv(self.b1[2], (3, 3), 2, 'b1_2')(y1, train)
        y2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        return jnp.concatenate([y0, y1, y2], axis=-1)


# (name, b0, b1, b2, b3, pool) in slim inception_v2_base order; None rows
# mark the stride-2 reductions
INCEPTION_V2_BLOCKS = (
    ('mixed_3b', 64, (64, 64), (64, 96, 96), 32, 'avg'),
    ('mixed_3c', 64, (64, 96), (64, 96, 96), 64, 'avg'),
    ('mixed_4a', None, (128, 160), (64, 96, 96), None, None),
    ('mixed_4b', 224, (64, 96), (96, 128, 128), 128, 'avg'),
    ('mixed_4c', 192, (96, 128), (96, 128, 128), 128, 'avg'),
    ('mixed_4d', 160, (128, 160), (128, 160, 160), 96, 'avg'),
    ('mixed_4e', 96, (128, 192), (160, 192, 192), 96, 'avg'),
    ('mixed_5a', None, (128, 192), (192, 256, 256), None, None),
    ('mixed_5b', 352, (192, 320), (160, 224, 224), 128, 'avg'),
    ('mixed_5c', 352, (192, 320), (192, 224, 224), 128, 'max'),
)


class InceptionV2Backbone(nn.Module):
    """Returns the SSD taps (Mixed_4c [19,19,576], Mixed_5c [10,10,1024]
    at 300x300 input)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = SeparableStem(dtype=self.dtype, name='stem')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        x = ConvBNRelu6(64, (1, 1), dtype=self.dtype,
                        name='conv2b')(x, train)
        x = ConvBNRelu6(192, (3, 3), dtype=self.dtype,
                        name='conv2c')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        c4 = None
        for name, b0, b1, b2, b3, pool in INCEPTION_V2_BLOCKS:
            if b0 is None:
                x = MixedReduction(b1, b2, dtype=self.dtype,
                                   name=name)(x, train)
            else:
                x = Mixed(b0, b1, b2, b3, pool, dtype=self.dtype,
                          name=name)(x, train)
            if name == 'mixed_4c':
                c4 = x
        return c4, x
