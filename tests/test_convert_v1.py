"""SSD-MobileNetV1 checkpoint conversion: the reference's FASTEST
documented family (/root/reference/README.md:446-451, e.g. the public
ssd_mobilenet_v1_coco_2018_01_28 model.ckpt). Same proof shape as the v2
test (tests/test_convert_head.py): a faithful TF-side SSD-MobileNetV1
written into a genuine checkpoint under the exact slim names, converted,
and matched numerically."""

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
    _write_checkpoint  # noqa: E402

NUM_CLASSES = 90
# the public ssd_mobilenet_v1_coco pipeline uses 1x1 predictor convs
# (kernel_size: 1), unlike v2's 3x3 — the converter must infer it
HEAD_KERNEL = 1
CFG = SSDConfig(num_classes=NUM_CLASSES, backbone='mobilenet_v1',
                head_kernel=HEAD_KERNEL, dtype=jnp.float32)


_V1_UNITS = ((1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
             (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),
             (2, 1024), (1, 1024))


def _build_tf_ssd_v1():
    """Manual Keras MobileNetV1 with padding='same' — keras.applications'
    MobileNet uses fixed asymmetric padding that diverges from TF SAME at
    odd feature sizes (75 -> 37 instead of the slim graph's 38)."""
    layers, Model, _ = _keras_layers()
    inp = layers.Input((300, 300, 3))
    x = layers.Conv2D(32, 3, strides=2, padding='same', use_bias=False,
                      name='conv1')(inp)
    x = layers.BatchNormalization(epsilon=1e-3, name='conv1_bn')(x)
    x = layers.ReLU(max_value=6.0)(x)
    taps = {}
    for n, (s, f) in enumerate(_V1_UNITS, start=1):
        x = layers.DepthwiseConv2D(3, strides=s, padding='same',
                                   use_bias=False,
                                   name='conv_dw_{}'.format(n))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='conv_dw_{}_bn'.format(n))(x)
        x = layers.ReLU(max_value=6.0)(x)
        x = layers.Conv2D(f, 1, padding='same', use_bias=False,
                          name='conv_pw_{}'.format(n))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='conv_pw_{}_bn'.format(n))(x)
        x = layers.ReLU(max_value=6.0)(x)
        if n in (11, 13):
            taps[n] = x
    feats = [taps[11], taps[13]]
    x = feats[1]
    for i, ch in enumerate(CFG.extra_features):
        x = layers.Conv2D(ch // 2, 1, use_bias=False,
                          name='ex{}_pw'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_pw_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
        x = layers.Conv2D(ch, 3, strides=2, padding='same', use_bias=False,
                          name='ex{}_conv'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
        feats.append(x)
    npl = anchors_per_location(CFG.anchor_spec)
    box_outs, cls_outs = [], []
    for i, (feat, n) in enumerate(zip(feats, npl)):
        b = layers.Conv2D(n * 4, HEAD_KERNEL, padding='same',
                          name='box_head{}'.format(i))(feat)
        c = layers.Conv2D(n * (NUM_CLASSES + 1), HEAD_KERNEL,
                          padding='same',
                          name='cls_head{}'.format(i))(feat)
        box_outs.append(layers.Reshape((-1, 4))(b))
        cls_outs.append(layers.Reshape((-1, NUM_CLASSES + 1))(c))
    return Model(inp, [layers.Concatenate(axis=1)(box_outs),
                       layers.Concatenate(axis=1)(cls_outs)])


def _slim_variables_v1(model):
    layer = {l.name: l for l in model.layers}
    out = {}
    root = 'FeatureExtractor/MobilenetV1/'

    def unit(scope, conv_name, bn_name, depthwise=False):
        kernel = layer[conv_name].get_weights()[0]
        out[scope + ('/depthwise_weights' if depthwise else '/weights')] = \
            kernel
        gamma, beta, mean, var = layer[bn_name].get_weights()
        out[scope + '/BatchNorm/gamma'] = gamma
        out[scope + '/BatchNorm/beta'] = beta
        out[scope + '/BatchNorm/moving_mean'] = mean
        out[scope + '/BatchNorm/moving_variance'] = var

    unit(root + 'Conv2d_0', 'conv1', 'conv1_bn')
    for n in range(1, 14):
        unit(root + 'Conv2d_{}_depthwise'.format(n),
             'conv_dw_{}'.format(n), 'conv_dw_{}_bn'.format(n),
             depthwise=True)
        unit(root + 'Conv2d_{}_pointwise'.format(n),
             'conv_pw_{}'.format(n), 'conv_pw_{}_bn'.format(n))
    for i, ch in enumerate(CFG.extra_features):
        unit(root + 'Conv2d_13_pointwise_1_Conv2d_{}_1x1_{}'.format(
            i + 2, ch // 2), 'ex{}_pw'.format(i), 'ex{}_pw_bn'.format(i))
        unit(root + 'Conv2d_13_pointwise_2_Conv2d_{}_3x3_s2_{}'.format(
            i + 2, ch), 'ex{}_conv'.format(i), 'ex{}_bn'.format(i))
    for i in range(CFG.anchor_spec.num_layers):
        for head, slim in (('box_head', 'BoxEncodingPredictor'),
                           ('cls_head', 'ClassPredictor')):
            kernel, bias = layer['{}{}'.format(head, i)].get_weights()
            scope = 'BoxPredictor_{}/{}'.format(i, slim)
            out[scope + '/weights'] = kernel
            out[scope + '/biases'] = bias
    return out


def test_v1_checkpoint_converts_and_matches_tf_outputs(tmp_path):
    from watsor_tpu.models.convert import convert_tf_od_checkpoint
    model = _build_tf_ssd_v1()
    _randomize(model)
    prefix = str(tmp_path / 'model.ckpt')
    _write_checkpoint(_slim_variables_v1(model), prefix)

    variables, config = convert_tf_od_checkpoint(prefix)
    assert config.backbone == 'mobilenet_v1'
    assert config.num_classes == NUM_CLASSES
    assert config.head_kernel == HEAD_KERNEL

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


def test_v1_zoo_entry_builds_and_detects():
    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('ssd_mobilenet_v1', dtype=jnp.float32)
    assert det.config.backbone == 'mobilenet_v1'
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (1, 300, 300, 3), np.uint8))
    out = det.detect_batch(det.params, images)
    assert out.boxes.shape == (1, det.config.max_detections, 4)
