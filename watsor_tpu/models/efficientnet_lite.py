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

from watsor_tpu.ops.packed_conv import (depth_to_space, packed_bn,
                                        packed_dense, packed_depthwise,
                                        packed_pointwise, space_to_depth)


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
    """Returns the stride-8/16/32 feature taps (C3, C4, C5).

    ``packing`` runs the entry of the network on a space-to-depth packed
    layout (ops/packed_conv.py) — bit-for-bit the same parameter tree
    (init always builds the standard modules), numerically the same
    outputs (the packed convs are exact re-associations of the same
    multiply-adds):

      * ``'stem'``: only the dense stem conv consumes the packed input
        ([S/2, S/2, 12] instead of [S, S, 3], which TPU lane tiling
        streams 128-padded — the measured Lite4 stem reads 104.7
        MB/frame for a 2.5 MB logical input, LITE4_PROFILE.jsonl).
      * ``'early'``: stem through stage 2 stay packed. Measured and
        REJECTED on chip (114 vs 34.5 ms for the Lite4 backbone,
        LITE4_PROFILE.jsonl): XLA lowers the 4-in/4-out grouped convs
        the packed depthwise needs by quadrupling bytes accessed.
        Retained for the record and the parity tests.

    Inference-only: training and init take the standard path.
    """

    variant: str = 'lite0'
    dtype: Any = jnp.bfloat16
    packing: str = 'none'           # 'none' | 'stem' | 'early'

    @nn.compact
    def __call__(self, x, train=False):
        block_args = lite_block_args(self.variant)
        packing = self.packing if not train and not self.is_initializing() \
            else 'none'
        taps = {}
        if packing == 'early':
            x, start_index = self._packed_early_stages(x, block_args)
            taps['C3'] = x              # stage-2 output = stride 8
        elif packing == 'stem':
            x = self._packed_stem(x)
            start_index = 0
        else:
            # Lite: stem is NOT width-scaled
            x = ConvBN(32, (3, 3), strides=2, dtype=self.dtype,
                       name='stem')(x, train)
            start_index = 0
        for block_index, (expand, features, strides, kernel, stage) in \
                enumerate(block_args):
            if block_index < start_index:
                continue
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

    def _packed_stem(self, x):
        """Dense stem conv on the space-to-depth input; unpacks right
        after, so no grouped convs are involved."""
        params = self.variables['params']['stem']
        stats = self.variables['batch_stats']['stem']
        xp = space_to_depth(x.astype(self.dtype))
        xp = packed_dense(xp, params['Conv_0']['kernel'], 2, x.shape[1])
        bn, bs = params['BatchNorm_0'], stats['BatchNorm_0']
        xp = packed_bn(xp, bn['scale'], bn['bias'], bs['mean'], bs['var'])
        return depth_to_space(xp)

    def _packed_early_stages(self, x, block_args):
        """Stem + stages 0-2 on the packed layout; returns the unpacked
        stride-8 tap and the index of the first stage-3 block."""
        params = self.variables['params']
        stats = self.variables['batch_stats']

        def conv_bn(xp, scope, kind, virtual, stride=1, relu6=True):
            p, s = params[scope], stats[scope]
            if kind is not None:        # nested ConvBN inside an MBConv
                p, s = p[kind], s[kind]
            w = p['Conv_0']['kernel']
            if w.shape[:2] == (1, 1):
                xp = packed_pointwise(xp, w)
            elif w.shape[2] == 1:       # depthwise (in_per_group == 1)
                xp = packed_depthwise(xp, w, stride, virtual)
            else:
                xp = packed_dense(xp, w, stride, virtual)
            bn, bs = p['BatchNorm_0'], s['BatchNorm_0']
            return packed_bn(xp, bn['scale'], bn['bias'],
                             bs['mean'], bs['var'], relu6=relu6)

        xp = space_to_depth(x.astype(self.dtype))
        virtual = x.shape[1]
        xp = conv_bn(xp, 'stem', None, virtual, stride=2)
        virtual //= 2
        in_features = 32
        start_index = 0
        for block_index, (expand, features, strides, kernel, stage) in \
                enumerate(block_args):
            if stage > 2:
                start_index = block_index
                break
            scope = f'block{block_index}'
            y = xp
            if expand != 1:
                y = conv_bn(y, scope, 'expand', virtual)
            y = conv_bn(y, scope, 'depthwise', virtual, stride=strides)
            virtual //= strides
            y = conv_bn(y, scope, 'project', virtual, relu6=False)
            if strides == 1 and in_features == features:
                y = y + xp
            xp = y
            in_features = features
        return depth_to_space(xp), start_index
