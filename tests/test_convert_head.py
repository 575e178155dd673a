"""Full SSD-head weight conversion: a real TF checkpoint (slim variable
naming, the exact layout of the public ssd_mobilenet_v2_coco_2018_03_29
model.ckpt) -> Flax detector with numerically matching raw head outputs.

The reference's detection quality comes from such checkpoints
(/root/reference/watsor/detection/tensorflow_cpu.py:35-62); this test is
the offline-environment equivalent of converting the public model: the TF
side IS a faithful SSD-MobileNetV2 (Keras backbone + extras + conv heads),
its weights are written into a genuine checkpoint file under the TF-OD-API
names, and the converter + Flax graph must reproduce its outputs.
"""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

from watsor_tpu.models.ssd import SSDConfig, build_detector  # noqa: E402
from watsor_tpu.ops.anchors import anchors_per_location  # noqa: E402

NUM_CLASSES = 90  # the production COCO geometry
CFG = SSDConfig(num_classes=NUM_CLASSES, dtype=jnp.float32)


def _keras_layers():
    try:
        from tf_keras import layers, Model
        from tf_keras.applications import MobileNetV2
    except ImportError:
        from tensorflow.keras import layers, Model
        from tensorflow.keras.applications import MobileNetV2
    return layers, Model, MobileNetV2


def _build_tf_ssd():
    """SSD-MobileNetV2 in Keras, matching the TF-OD-API architecture."""
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
        x = layers.Conv2D(ch, 3, strides=2, padding='same', use_bias=False,
                          name='ex{}_conv'.format(i))(x)
        x = layers.BatchNormalization(epsilon=1e-3,
                                      name='ex{}_bn'.format(i))(x)
        x = layers.ReLU(max_value=6.0)(x)
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
    return Model(backbone.input, [out_box, out_cls])


def _randomize(model, seed=0):
    """Non-degenerate BN statistics and biases so mapping bugs (swapped
    gamma/beta, missing moving stats, dropped biases) can't hide."""
    rng = np.random.default_rng(seed)
    for w in model.weights:
        name = w.name
        shape = tuple(w.shape)
        if 'gamma' in name:
            w.assign(rng.uniform(0.8, 1.2, shape).astype(np.float32))
        elif 'beta' in name:
            w.assign(rng.normal(0.0, 0.1, shape).astype(np.float32))
        elif 'moving_mean' in name:
            w.assign(rng.normal(0.0, 0.2, shape).astype(np.float32))
        elif 'moving_variance' in name:
            w.assign(rng.uniform(0.5, 1.5, shape).astype(np.float32))
        elif 'bias' in name:
            w.assign(rng.normal(0.0, 0.05, shape).astype(np.float32))


def _slim_variables(model):
    """Extract the model's weights under the TF-OD-API checkpoint names."""
    layer = {l.name: l for l in model.layers}
    out = {}
    root = 'FeatureExtractor/MobilenetV2/'

    def unit(scope, conv_name, bn_name, depthwise=False):
        kernel = layer[conv_name].get_weights()[0]
        out[scope + ('/depthwise_weights' if depthwise else '/weights')] = \
            kernel
        gamma, beta, mean, var = layer[bn_name].get_weights()
        out[scope + '/BatchNorm/gamma'] = gamma
        out[scope + '/BatchNorm/beta'] = beta
        out[scope + '/BatchNorm/moving_mean'] = mean
        out[scope + '/BatchNorm/moving_variance'] = var

    unit(root + 'Conv', 'Conv1', 'bn_Conv1')
    unit(root + 'expanded_conv/depthwise', 'expanded_conv_depthwise',
         'expanded_conv_depthwise_BN', depthwise=True)
    unit(root + 'expanded_conv/project', 'expanded_conv_project',
         'expanded_conv_project_BN')
    for n in range(1, 17):
        keras_prefix = 'block_{}_'.format(n)
        scope = root + 'expanded_conv_{}'.format(n)
        unit(scope + '/expand', keras_prefix + 'expand',
             keras_prefix + 'expand_BN')
        unit(scope + '/depthwise', keras_prefix + 'depthwise',
             keras_prefix + 'depthwise_BN', depthwise=True)
        unit(scope + '/project', keras_prefix + 'project',
             keras_prefix + 'project_BN')
    unit(root + 'Conv_1', 'Conv_1', 'Conv_1_bn')

    for i, ch in enumerate(CFG.extra_features):
        unit(root + 'layer_19_1_Conv2d_{}_1x1_{}'.format(i + 2, ch // 2),
             'ex{}_pw'.format(i), 'ex{}_pw_bn'.format(i))
        unit(root + 'layer_19_2_Conv2d_{}_3x3_s2_{}'.format(i + 2, ch),
             'ex{}_conv'.format(i), 'ex{}_bn'.format(i))

    n_layers = CFG.anchor_spec.num_layers
    for i in range(n_layers):
        for head, slim in (('box_head', 'BoxEncodingPredictor'),
                           ('cls_head', 'ClassPredictor')):
            kernel, bias = layer['{}{}'.format(head, i)].get_weights()
            scope = 'BoxPredictor_{}/{}'.format(i, slim)
            out[scope + '/weights'] = kernel
            out[scope + '/biases'] = bias
    return out


def _write_checkpoint(variables, prefix):
    """Write a genuine TF checkpoint (V2 format) with the given names —
    exactly what tf.train.load_checkpoint reads from the public tarball."""
    graph = tf.Graph()
    with graph.as_default():
        var_list = {}
        for i, (name, value) in enumerate(variables.items()):
            var_list[name] = tf.compat.v1.Variable(
                value, name='v{}'.format(i))
        saver = tf.compat.v1.train.Saver(var_list=var_list)
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)


@pytest.fixture(scope='module')
def tf_rig(tmp_path_factory):
    model = _build_tf_ssd()
    _randomize(model)
    prefix = str(tmp_path_factory.mktemp('ckpt') / 'model.ckpt')
    _write_checkpoint(_slim_variables(model), prefix)
    return model, prefix


def test_checkpoint_converts_and_matches_tf_outputs(tf_rig):
    from watsor_tpu.models.convert import convert_tf_od_checkpoint
    model, prefix = tf_rig
    variables, config = convert_tf_od_checkpoint(prefix)
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


def test_cli_roundtrip_into_zoo(tf_rig, tmp_path):
    """The documented path: convert CLI -> model dir -> zoo loads it."""
    from watsor_tpu.models import convert
    model, prefix = tf_rig
    out_dir = str(tmp_path / 'model')
    convert.main(['-c', prefix, '-o', out_dir, '-n', 'ssd_mobilenet_v2'])

    import os
    assert os.path.exists(os.path.join(out_dir, 'ssd_mobilenet_v2.msgpack'))

    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('ssd_mobilenet_v2', out_dir, dtype=jnp.float32)
    # adopted (not random) weights: heads must match the checkpoint
    bias = np.asarray(
        det.params['params']['cls_head0']['bias'])
    expected = model.get_layer('cls_head0').get_weights()[1]
    np.testing.assert_allclose(bias, expected, atol=0)


def test_missing_variable_is_reported(tf_rig):
    from watsor_tpu.models.convert import (MissingVariable,
                                           load_tf_checkpoint_variables,
                                           tf_od_variables_to_flax)
    _, prefix = tf_rig
    variables = load_tf_checkpoint_variables(prefix)
    del variables['BoxPredictor_3/ClassPredictor/weights']
    with pytest.raises(MissingVariable):
        tf_od_variables_to_flax(variables, CFG)


def test_frozen_graph_pb_converts(tf_rig, tmp_path):
    """The reference's cpu.pb model file (frozen_inference_graph.pb,
    /root/reference/README.md:446) converts directly: freezing keeps the
    slim variable names as Const nodes."""
    from watsor_tpu.models.convert import (convert_tf_od_variables,
                                           load_frozen_graph_variables)
    from tests.test_convert_head import _slim_variables
    model, _ = tf_rig
    variables = _slim_variables(model)
    # build a frozen graph: one Const node per variable, exact names
    graph = tf.Graph()
    with graph.as_default():
        for name, value in variables.items():
            tf.constant(value, name=name)
    pb = tmp_path / 'cpu.pb'
    pb.write_bytes(graph.as_graph_def().SerializeToString())

    loaded = load_frozen_graph_variables(str(pb))
    tree, config = convert_tf_od_variables(loaded)
    assert config.backbone == 'mobilenet_v2'
    got = np.asarray(tree['params']['cls_head0']['bias'])
    expected = model.get_layer('cls_head0').get_weights()[1]
    np.testing.assert_allclose(got, expected, atol=0)


def test_saved_model_dir_resolves_to_variables_checkpoint(tmp_path):
    from watsor_tpu.models.convert import resolve_model_source
    sm = tmp_path / 'saved_model'
    (sm / 'variables').mkdir(parents=True)
    (sm / 'saved_model.pb').write_bytes(b'')
    kind, source = resolve_model_source(str(sm))
    assert kind == 'checkpoint'
    assert source.endswith('variables/variables')
    kind2, _ = resolve_model_source(str(tmp_path / 'model.ckpt'))
    assert kind2 == 'checkpoint'
    kind3, _ = resolve_model_source(str(tmp_path / 'cpu.pb'))
    assert kind3 == 'frozen_graph'
