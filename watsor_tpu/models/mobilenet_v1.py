"""MobileNetV1 backbone (Flax) — the reference's FASTEST documented model
family (/root/reference/README.md:446-451 lists ssd_mobilenet_v1 for every
backend: EdgeTPU tflite, gpu.uff, cpu.pb). Clean re-implementation of the
published design (arXiv:1704.04861): a stem conv + 13 depthwise-separable
units, each depthwise 3x3 + pointwise 1x1 with BN+relu6.

SSD taps match the TF OD API's ssd_mobilenet_v1 feature extractor:
Conv2d_11_pointwise (stride 16, 512 ch) and Conv2d_13_pointwise
(stride 32, 1024 ch).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from watsor_tpu.models.mobilenet_v2 import ConvBNRelu6, _make_divisible

# (strides of the depthwise, pointwise output channels) for units 1..13
MOBILENET_V1_UNITS = (
    (1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
    (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),
    (2, 1024), (1, 1024),
)


class MobileNetV1Backbone(nn.Module):
    """Returns (C4, C5): the unit-11 (stride 16) and unit-13 (stride 32)
    pointwise outputs."""

    width_multiplier: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        wm = self.width_multiplier
        x = ConvBNRelu6(_make_divisible(32 * wm), (3, 3), strides=2,
                        dtype=self.dtype, name='stem')(x, train)
        tap_c4 = None
        for n, (strides, features) in enumerate(MOBILENET_V1_UNITS,
                                                start=1):
            x = ConvBNRelu6(x.shape[-1], (3, 3), strides=strides,
                            groups=x.shape[-1], dtype=self.dtype,
                            name='unit{}_depthwise'.format(n))(x, train)
            x = ConvBNRelu6(_make_divisible(features * wm), (1, 1),
                            dtype=self.dtype,
                            name='unit{}_pointwise'.format(n))(x, train)
            if n == 11:
                tap_c4 = x
        return tap_c4, x
