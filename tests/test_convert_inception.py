"""SSD-InceptionV2 weight conversion: a real TF checkpoint (the slim
variable layout of the public ssd_inception_v2_coco_2018_01_28 model.ckpt
— the third column of the reference's model table,
/root/reference/README.md:446-450) -> Flax detector with numerically
matching raw head outputs.

Same strategy as tests/test_convert_head.py: the TF side is a faithful
Keras implementation of the architecture, its weights are written into a
genuine checkpoint under the TF-OD-API names, and the converter + Flax
graph must reproduce its outputs — this exercises every piece the real
checkpoint needs (separable stem layout, branch order, SAME pooling
semantics incl. the avg-pool divisor, stride-2 padding, extras, heads).
"""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

from watsor_tpu.models.inception_v2 import INCEPTION_V2_BLOCKS  # noqa: E402
from watsor_tpu.models.ssd import SSDConfig, build_detector  # noqa: E402
from watsor_tpu.ops.anchors import anchors_per_location  # noqa: E402

NUM_CLASSES = 90
CFG = SSDConfig(num_classes=NUM_CLASSES, backbone='inception_v2',
                dtype=jnp.float32)

_ROOT = 'FeatureExtractor/InceptionV2/'


def _keras_layers():
    try:
        from tf_keras import layers, Model
    except ImportError:
        from tensorflow.keras import layers, Model
    return layers, Model


def _build_tf_inception_ssd():
    layers, Model = _keras_layers()

    def conv_bn(x, ch, k, name, strides=1):
        x = layers.Conv2D(ch, k, strides=strides, padding='same',
                          use_bias=False, name=name)(x)
        x = layers.BatchNormalization(epsilon=1e-3, name=name + '_bn')(x)
        return layers.ReLU(max_value=6.0)(x)

    inputs = layers.Input((300, 300, 3))
    # separable stem: one BN on the pointwise output (slim layout)
    x = layers.SeparableConv2D(64, 7, strides=2, depth_multiplier=8,
                               padding='same', use_bias=False,
                               name='stem')(inputs)
    x = layers.BatchNormalization(epsilon=1e-3, name='stem_bn')(x)
    x = layers.ReLU(max_value=6.0)(x)
    x = layers.MaxPooling2D(3, 2, padding='same')(x)
    x = conv_bn(x, 64, 1, 'conv2b')
    x = conv_bn(x, 192, 3, 'conv2c')
    x = layers.MaxPooling2D(3, 2, padding='same')(x)

    taps = {}
    for name, b0, b1, b2, b3, pool in INCEPTION_V2_BLOCKS:
        if b0 is None:       # reduction
            y0 = conv_bn(x, b1[0], 1, name + '_b0_0')
            y0 = conv_bn(y0, b1[1], 3, name + '_b0_1', strides=2)
            y1 = conv_bn(x, b2[0], 1, name + '_b1_0')
            y1 = conv_bn(y1, b2[1], 3, name + '_b1_1')
            y1 = conv_bn(y1, b2[2], 3, name + '_b1_2', strides=2)
            y2 = layers.MaxPooling2D(3, 2, padding='same')(x)
            x = layers.Concatenate()([y0, y1, y2])
        else:
            y0 = conv_bn(x, b0, 1, name + '_b0')
            y1 = conv_bn(x, b1[0], 1, name + '_b1_0')
            y1 = conv_bn(y1, b1[1], 3, name + '_b1_1')
            y2 = conv_bn(x, b2[0], 1, name + '_b2_0')
            y2 = conv_bn(y2, b2[1], 3, name + '_b2_1')
            y2 = conv_bn(y2, b2[2], 3, name + '_b2_2')
            if pool == 'max':
                y3 = layers.MaxPooling2D(3, 1, padding='same')(x)
            else:
                y3 = layers.AveragePooling2D(3, 1, padding='same')(x)
            y3 = conv_bn(y3, b3, 1, name + '_b3')
            x = layers.Concatenate()([y0, y1, y2, y3])
        taps[name] = x

    feats = [taps['mixed_4c'], taps['mixed_5c']]
    x = taps['mixed_5c']
    for i, ch in enumerate(CFG.extra_features):
        x = conv_bn(x, ch // 2, 1, 'ex{}_pw'.format(i))
        x = conv_bn(x, ch, 3, 'ex{}_conv'.format(i), strides=2)
        feats.append(x)

    npl = anchors_per_location(CFG.anchor_spec)
    box_outs, cls_outs = [], []
    for i, (feat, n) in enumerate(zip(feats, npl)):
        b = layers.Conv2D(n * 4, 3, padding='same',
                          name='box_head{}'.format(i))(feat)
        c = layers.Conv2D(n * (NUM_CLASSES + 1), 3, padding='same',
                          name='cls_head{}'.format(i))(feat)
        box_outs.append(layers.Reshape((-1, 4))(b))
        cls_outs.append(layers.Reshape((-1, NUM_CLASSES + 1))(c))
    out_box = layers.Concatenate(axis=1)(box_outs)
    out_cls = layers.Concatenate(axis=1)(cls_outs)
    return Model(inputs, [out_box, out_cls])


def _slim_variables(model):
    layer = {l.name: l for l in model.layers}
    out = {}

    def unit(scope, conv_name):
        out[scope + '/weights'] = layer[conv_name].get_weights()[0]
        gamma, beta, mean, var = layer[conv_name + '_bn'].get_weights()
        out[scope + '/BatchNorm/gamma'] = gamma
        out[scope + '/BatchNorm/beta'] = beta
        out[scope + '/BatchNorm/moving_mean'] = mean
        out[scope + '/BatchNorm/moving_variance'] = var

    # stem: separable with one BN
    dw, pw = layer['stem'].get_weights()
    scope = _ROOT + 'Conv2d_1a_7x7'
    out[scope + '/depthwise_weights'] = dw            # [7, 7, 3, 8]
    out[scope + '/pointwise_weights'] = pw            # [1, 1, 24, 64]
    gamma, beta, mean, var = layer['stem_bn'].get_weights()
    out[scope + '/BatchNorm/gamma'] = gamma
    out[scope + '/BatchNorm/beta'] = beta
    out[scope + '/BatchNorm/moving_mean'] = mean
    out[scope + '/BatchNorm/moving_variance'] = var

    unit(_ROOT + 'Conv2d_2b_1x1', 'conv2b')
    unit(_ROOT + 'Conv2d_2c_3x3', 'conv2c')

    for name, b0, b1, b2, b3, pool in INCEPTION_V2_BLOCKS:
        scope = _ROOT + 'Mixed_' + name.split('_')[1] + '/'
        if b0 is None:
            unit(scope + 'Branch_0/Conv2d_0a_1x1', name + '_b0_0')
            unit(scope + 'Branch_0/Conv2d_1a_3x3', name + '_b0_1')
            unit(scope + 'Branch_1/Conv2d_0a_1x1', name + '_b1_0')
            unit(scope + 'Branch_1/Conv2d_0b_3x3', name + '_b1_1')
            unit(scope + 'Branch_1/Conv2d_1a_3x3', name + '_b1_2')
        else:
            unit(scope + 'Branch_0/Conv2d_0a_1x1', name + '_b0')
            unit(scope + 'Branch_1/Conv2d_0a_1x1', name + '_b1_0')
            unit(scope + 'Branch_1/Conv2d_0b_3x3', name + '_b1_1')
            unit(scope + 'Branch_2/Conv2d_0a_1x1', name + '_b2_0')
            unit(scope + 'Branch_2/Conv2d_0b_3x3', name + '_b2_1')
            unit(scope + 'Branch_2/Conv2d_0c_3x3', name + '_b2_2')
            unit(scope + 'Branch_3/Conv2d_0b_1x1', name + '_b3')

    for i, ch in enumerate(CFG.extra_features):
        unit(_ROOT + 'Mixed_5c_1_Conv2d_{}_1x1_{}'.format(i + 2, ch // 2),
             'ex{}_pw'.format(i))
        unit(_ROOT + 'Mixed_5c_2_Conv2d_{}_3x3_s2_{}'.format(i + 2, ch),
             'ex{}_conv'.format(i))

    for i in range(CFG.anchor_spec.num_layers):
        for head, slim in (('box_head', 'BoxEncodingPredictor'),
                           ('cls_head', 'ClassPredictor')):
            kernel, bias = layer['{}{}'.format(head, i)].get_weights()
            scope = 'BoxPredictor_{}/{}'.format(i, slim)
            out[scope + '/weights'] = kernel
            out[scope + '/biases'] = bias
    return out


@pytest.fixture(scope='module')
def inception_rig(tmp_path_factory):
    from tests.test_convert_head import _randomize, _write_checkpoint
    model = _build_tf_inception_ssd()
    _randomize(model)
    prefix = str(tmp_path_factory.mktemp('ckpt') / 'model.ckpt')
    _write_checkpoint(_slim_variables(model), prefix)
    return model, prefix


def test_family_autodetected_and_outputs_match(inception_rig):
    from watsor_tpu.models.convert import convert_tf_od_checkpoint
    model, prefix = inception_rig
    variables, config = convert_tf_od_checkpoint(prefix)
    assert config.backbone == 'inception_v2'
    assert config.num_classes == NUM_CLASSES

    rng = np.random.default_rng(42)
    image = rng.uniform(-1.0, 1.0, (1, 300, 300, 3)).astype(np.float32)

    tf_box, tf_cls = model(image, training=False)
    det = build_detector(CFG, params=variables)
    jx_box, jx_cls = det.raw_apply(variables, jnp.asarray(image))

    assert jx_box.shape == tuple(tf_box.shape)
    assert jx_cls.shape == tuple(tf_cls.shape)
    np.testing.assert_allclose(np.asarray(jx_box), tf_box.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jx_cls), tf_cls.numpy(),
                               atol=2e-3, rtol=2e-3)


def test_cli_roundtrip_into_zoo_with_smoke_detect(inception_rig, tmp_path):
    from watsor_tpu.models import convert
    model, prefix = inception_rig
    out_dir = str(tmp_path / 'model')
    convert.main(['-c', prefix, '-o', out_dir])

    import os
    assert os.path.exists(os.path.join(out_dir, 'ssd_inception_v2.msgpack'))

    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('ssd_inception_v2', out_dir, dtype=jnp.float32)
    bias = np.asarray(det.params['params']['cls_head0']['bias'])
    expected = model.get_layer('cls_head0').get_weights()[1]
    np.testing.assert_allclose(bias, expected, atol=0)
    # smoke the jitted end-to-end path
    out = det.detect_batch(det.params, np.zeros((1, 300, 300, 3), np.uint8))
    assert out.boxes.shape == (1, 100, 4)


def test_missing_inception_variable_reported(inception_rig):
    from watsor_tpu.models.convert import (
        MissingVariable, load_tf_checkpoint_variables,
        tf_od_inception_variables_to_flax)
    _, prefix = inception_rig
    variables = load_tf_checkpoint_variables(prefix)
    del variables[_ROOT + 'Mixed_4c/Branch_2/Conv2d_0c_3x3/weights']
    with pytest.raises(MissingVariable):
        tf_od_inception_variables_to_flax(variables, CFG)
