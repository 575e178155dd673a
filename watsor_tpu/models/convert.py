"""Weight conversion: public TF/Keras MobileNetV2 checkpoints -> the Flax
backbone, with numerically matching activations.

This is the "weight sourcing" path (SURVEY.md §7 hard-part 5): the
reference consumes SSD-MobileNet graphs as opaque binaries; here public
checkpoints load into the first-class Flax modules. The layer mapping
covers the canonical Keras MobileNetV2 naming (also produced by exporting
TF-Hub / TF-OD-API feature extractors through Keras):

    Conv1 / bn_Conv1                          -> stem
    expanded_conv_{depthwise,project}(+BN)    -> block0 (expand ratio 1)
    block_N_{expand,depthwise,project}(+BN)   -> blockN
    Conv_1 / Conv_1_bn                        -> head

Gated on TensorFlow being importable; everything else in the framework
works without it.
"""

import numpy as np


def _bn(weights):
    gamma, beta, mean, var = weights
    return ({'scale': np.asarray(gamma), 'bias': np.asarray(beta)},
            {'mean': np.asarray(mean), 'var': np.asarray(var)})


def _conv_bn(conv_weights, bn_weights, depthwise=False):
    kernel = np.asarray(conv_weights[0])
    if depthwise:
        # keras depthwise kernel [kh, kw, in, 1] -> flax grouped-conv
        # kernel [kh, kw, 1, in]
        kernel = np.transpose(kernel, (0, 1, 3, 2))
    bn_params, bn_stats = _bn(bn_weights)
    return ({'Conv_0': {'kernel': kernel}, 'BatchNorm_0': bn_params},
            {'BatchNorm_0': bn_stats})


def keras_mobilenet_v2_to_flax(keras_model):
    """Keras MobileNetV2 (any alpha) -> (params, batch_stats) trees shaped
    for watsor_tpu.models.mobilenet_v2.MobileNetV2Backbone."""
    layers = {layer.name: layer for layer in keras_model.layers}

    def weights_of(name):
        return [np.asarray(w) for w in layers[name].get_weights()]

    params = {}
    stats = {}

    def put(module, sub, conv_name, bn_name, depthwise=False):
        p, s = _conv_bn(weights_of(conv_name), weights_of(bn_name),
                        depthwise)
        params.setdefault(module, {})
        stats.setdefault(module, {})
        if sub is None:
            params[module] = p
            stats[module] = s
        else:
            params[module][sub] = p
            stats[module][sub] = s

    put('stem', None, 'Conv1', 'bn_Conv1')
    # block 0: expand ratio 1 (no expand conv)
    put('block0', 'depthwise', 'expanded_conv_depthwise',
        'expanded_conv_depthwise_BN', depthwise=True)
    put('block0', 'project', 'expanded_conv_project',
        'expanded_conv_project_BN')
    for n in range(1, 17):
        prefix = 'block_{}_'.format(n)
        module = 'block{}'.format(n)
        if n == 13:
            # our backbone names block13's stages explicitly (the C4 tap)
            put('block13_expand', None, prefix + 'expand',
                prefix + 'expand_BN')
            put('block13_depthwise', None, prefix + 'depthwise',
                prefix + 'depthwise_BN', depthwise=True)
            put('block13_project', None, prefix + 'project',
                prefix + 'project_BN')
            continue
        put(module, 'expand', prefix + 'expand', prefix + 'expand_BN')
        put(module, 'depthwise', prefix + 'depthwise',
            prefix + 'depthwise_BN', depthwise=True)
        put(module, 'project', prefix + 'project', prefix + 'project_BN')
    put('head', None, 'Conv_1', 'Conv_1_bn')
    return params, stats


def load_keras_mobilenet_v2(width_multiplier=1.0, weights=None,
                            input_size=224):
    """Build the Keras reference model (requires tensorflow)."""
    try:
        from tf_keras.applications import MobileNetV2
    except ImportError:
        from tensorflow.keras.applications import MobileNetV2
    return MobileNetV2(input_shape=(input_size, input_size, 3),
                       alpha=width_multiplier, include_top=False,
                       weights=weights)


def backbone_variables_from_keras(keras_model, dtype=None):
    """-> flax variables dict {'params': ..., 'batch_stats': ...}."""
    params, stats = keras_mobilenet_v2_to_flax(keras_model)
    if dtype is not None:
        import jax
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype), params)
    return {'params': params, 'batch_stats': stats}
