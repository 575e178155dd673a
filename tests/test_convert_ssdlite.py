"""SSDLite checkpoint conversion: the use_depthwise variant
(the public ssdlite_mobilenet_v2_coco_2018_05_09 model.ckpt) — separable
3x3 extras and separable predictors. Same proof shape as the v1/v2 tests:
a faithful TF-side SSDLite written into a genuine checkpoint under the
exact slim names (…_depthwise scopes), converted, matched numerically."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

from watsor_tpu.models.ssd import SSDConfig, build_detector  # noqa: E402
from watsor_tpu.ops.anchors import anchors_per_location  # noqa: E402
from tests.test_convert_head import _keras_layers, _randomize, \
    _slim_variables, _write_checkpoint  # noqa: E402

NUM_CLASSES = 90
CFG = SSDConfig(num_classes=NUM_CLASSES, lite=True, dtype=jnp.float32)


def _build_tf_ssdlite():
    layers, Model, MobileNetV2 = _keras_layers()
    backbone = MobileNetV2(input_shape=(300, 300, 3), include_top=False,
                           weights=None)
    feats = [backbone.get_layer('block_13_expand_relu').output,
             backbone.get_layer('out_relu').output]
    x = feats[1]
    for i, ch in enumerate(CFG.extra_features):
        x = layers.Conv2D(ch // 2, 1, use_bias=False,
                          name='ex{}_pw'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_pw_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
        x = layers.DepthwiseConv2D(3, strides=2, padding='same',
                                   use_bias=False,
                                   name='ex{}_dw'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_dw_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
        x = layers.Conv2D(ch, 1, use_bias=False,
                          name='ex{}_conv'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
        feats.append(x)
    npl = anchors_per_location(CFG.anchor_spec)
    box_outs, cls_outs = [], []
    for i, (feat, n) in enumerate(zip(feats, npl)):
        outs = []
        for head, channels in (('box_head', n * 4),
                               ('cls_head', n * (NUM_CLASSES + 1))):
            y = layers.DepthwiseConv2D(3, padding='same', use_bias=False,
                                       name='{}{}_dw'.format(head, i))(feat)
            y = layers.BatchNormalization(
                epsilon=1e-3, name='{}{}_dw_bn'.format(head, i))(y)
            y = layers.ReLU(max_value=6.0)(y)
            y = layers.Conv2D(channels, 1,
                              name='{}{}'.format(head, i))(y)
            outs.append(y)
        box_outs.append(layers.Reshape((-1, 4))(outs[0]))
        cls_outs.append(layers.Reshape((-1, NUM_CLASSES + 1))(outs[1]))
    return Model(backbone.input, [layers.Concatenate(axis=1)(box_outs),
                                  layers.Concatenate(axis=1)(cls_outs)])


def _slim_variables_lite(model):
    """Reuses the v2 backbone mapping; replaces the extras' 3x3 stage and
    adds the predictor depthwise scopes with their checkpoint names."""
    out = _slim_variables(model)   # backbone + pw extras + final heads;
    layer = {l.name: l for l in model.layers}
    root = 'FeatureExtractor/MobilenetV2/'

    def unit(scope, conv_name, bn_name, depthwise=False):
        out[scope + ('/depthwise_weights' if depthwise else '/weights')] = \
            layer[conv_name].get_weights()[0]
        gamma, beta, mean, var = layer[bn_name].get_weights()
        out[scope + '/BatchNorm/gamma'] = gamma
        out[scope + '/BatchNorm/beta'] = beta
        out[scope + '/BatchNorm/moving_mean'] = mean
        out[scope + '/BatchNorm/moving_variance'] = var

    # drop the dense-3x3 extras entries the v2 helper guessed (absent in
    # a lite checkpoint), then write the separable ones
    for i, ch in enumerate(CFG.extra_features):
        scope = root + 'layer_19_2_Conv2d_{}_3x3_s2_{}'.format(i + 2, ch)
        for name in list(out):
            if name.startswith(scope) and '_depthwise' not in name:
                del out[name]
        unit(scope + '_depthwise', 'ex{}_dw'.format(i),
             'ex{}_dw_bn'.format(i), depthwise=True)
        unit(scope, 'ex{}_conv'.format(i), 'ex{}_bn'.format(i))
    for i in range(CFG.anchor_spec.num_layers):
        for head, slim in (('box_head', 'BoxEncodingPredictor'),
                           ('cls_head', 'ClassPredictor')):
            unit('BoxPredictor_{}/{}_depthwise'.format(i, slim),
                 '{}{}_dw'.format(head, i), '{}{}_dw_bn'.format(head, i),
                 depthwise=True)
    return out


def test_ssdlite_checkpoint_converts_and_matches_tf_outputs(tmp_path):
    from watsor_tpu.models.convert import convert_tf_od_checkpoint
    model = _build_tf_ssdlite()
    _randomize(model)
    prefix = str(tmp_path / 'model.ckpt')
    _write_checkpoint(_slim_variables_lite(model), prefix)

    variables, config = convert_tf_od_checkpoint(prefix)
    assert config.lite
    assert config.head_kernel == 3
    assert config.num_classes == NUM_CLASSES

    rng = np.random.default_rng(42)
    image = rng.uniform(-1.0, 1.0, (1, 300, 300, 3)).astype(np.float32)
    tf_box, tf_cls = model(image, training=False)
    det = build_detector(CFG, params=variables)
    jx_box, jx_cls = det.raw_apply(variables, jnp.asarray(image))
    assert jx_box.shape == tuple(tf_box.shape)
    np.testing.assert_allclose(np.asarray(jx_box), tf_box.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jx_cls), tf_cls.numpy(),
                               atol=2e-3, rtol=2e-3)


def test_ssdlite_zoo_entry_builds_and_detects():
    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('ssdlite_mobilenet_v2', dtype=jnp.float32)
    assert det.config.lite
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (1, 300, 300, 3), np.uint8))
    out = det.detect_batch(det.params, images)
    assert out.boxes.shape == (1, det.config.max_detections, 4)


def test_plain_weights_under_lite_name_downgrade(tmp_path):
    """Weights decide the head geometry in BOTH directions: plain (dense)
    v2 weights stored under the ssdlite name must build and apply."""
    from watsor_tpu.models.zoo import build_from_zoo, save_weights
    det = build_detector(SSDConfig(dtype=jnp.float32))
    save_weights(det.params, str(tmp_path), 'ssdlite_mobilenet_v2')
    loaded = build_from_zoo('ssdlite_mobilenet_v2', str(tmp_path),
                            dtype=jnp.float32)
    assert not loaded.config.lite
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 300, 300, 3)).astype(np.float32))
    boxes, logits = loaded.raw_apply(loaded.params, x)
    assert boxes.shape[-1] == 4
