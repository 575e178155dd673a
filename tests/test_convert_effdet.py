"""automl EfficientDet-Lite checkpoint conversion: a real TF checkpoint
(automl variable naming, the layout of the public efficientdet-lite{0..4}
release tarballs) -> Flax detector with numerically matching raw outputs.

The reference can only serve EfficientDet as an opaque TFLite flatbuffer
(/root/reference/watsor/detection/tensorflow_lite_cpu.py); this test is the
offline-environment equivalent of converting the public model: the TF side
is an INDEPENDENT implementation of the automl-Lite forward (plain tf.nn
ops, no code shared with the Flax model), its weights are written into a
genuine checkpoint file under the automl names, and the converter + Flax
graph must reproduce its outputs.
"""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

from watsor_tpu.models.efficientdet import build_effdet, lite_config  # noqa: E402
from watsor_tpu.models.efficientnet_lite import lite_block_args  # noqa: E402

# real lite0 backbone; small FPN/heads keep the single-core runtime down.
# Geometry (channels/repeats/classes) is INFERRED by the converter, so
# non-default values here also prove the inference.
VARIANT = 'lite0'
NUM_CLASSES = 7
FPN_CH = 24
FPN_REPEATS = 2
HEAD_REPEATS = 2
INPUT = 128
ANCHORS = 9
ROOT = 'efficientnet-{}/'.format(VARIANT)

# automl resample scope names inside cell_0 (converter matches by regex,
# these specific indices only need to look like the real thing)
RESAMPLE_SCOPES = {1: 'resample_0_2_6', 2: 'resample_0_1_7',
                   3: 'resample_0_0_8', 4: 'resample_0_1_9',
                   5: 'resample_0_2_10'}


def _make_variables(seed=0):
    """Random automl-named variables with non-degenerate BN statistics so
    mapping bugs (swapped gamma/beta, missing moving stats, dropped biases,
    wrong BN index) can't hide."""
    rng = np.random.default_rng(seed)
    v = {}

    def kernel(name, kh, kw, cin, cout):
        scale = 1.0 / np.sqrt(kh * kw * cin)
        v[name] = rng.normal(0.0, scale, (kh, kw, cin, cout)).astype(
            np.float32)

    def bias(name, c):
        v[name] = rng.normal(0.0, 0.05, (c,)).astype(np.float32)

    def bn(scope, c):
        v[scope + '/gamma'] = rng.uniform(0.8, 1.2, (c,)).astype(np.float32)
        v[scope + '/beta'] = rng.normal(0.0, 0.1, (c,)).astype(np.float32)
        v[scope + '/moving_mean'] = rng.normal(0.0, 0.2, (c,)).astype(
            np.float32)
        v[scope + '/moving_variance'] = rng.uniform(0.5, 1.5, (c,)).astype(
            np.float32)

    def sep(scope, cin, cout):
        kernel(scope + '/depthwise_kernel', 3, 3, cin, 1)
        kernel(scope + '/pointwise_kernel', 1, 1, cin, cout)
        bias(scope + '/bias', cout)

    # --- backbone ---
    kernel(ROOT + 'stem/conv2d/kernel', 3, 3, 3, 32)
    bn(ROOT + 'stem/tpu_batch_normalization', 32)
    cin = 32
    taps = {}
    blocks = lite_block_args(VARIANT)
    for i, (expand, cout, stride, (kh, kw), stage) in enumerate(blocks):
        scope = ROOT + 'blocks_{}'.format(i)
        mid = cin * expand
        if expand != 1:
            kernel(scope + '/conv2d/kernel', 1, 1, cin, mid)
            bn(scope + '/tpu_batch_normalization', mid)
            dw_bn, proj_conv, proj_bn = '_1', '/conv2d_1/kernel', '_2'
        else:
            dw_bn, proj_conv, proj_bn = '', '/conv2d/kernel', '_1'
        kernel(scope + '/depthwise_conv2d/depthwise_kernel', kh, kw, mid, 1)
        bn(scope + '/tpu_batch_normalization' + dw_bn, mid)
        kernel(scope + proj_conv, 1, 1, mid, cout)
        bn(scope + '/tpu_batch_normalization' + proj_bn, cout)
        cin = cout
        last_of_stage = (i + 1 == len(blocks) or blocks[i + 1][4] != stage)
        if last_of_stage and stage in (2, 4, 6):
            taps[stage] = cout
    c3_ch, c4_ch, c5_ch = taps[2], taps[4], taps[6]

    # --- FPN ---
    kernel('resample_p6/conv2d/kernel', 1, 1, c5_ch, FPN_CH)
    bn('resample_p6/bn', FPN_CH)
    lateral_ch = {1: c5_ch, 2: c4_ch, 3: c3_ch, 4: c4_ch, 5: c5_ch}
    for r in range(FPN_REPEATS):
        for k in range(8):
            node = 'fpn_cells/cell_{}/fnode{}'.format(r, k)
            if r == 0 and k in RESAMPLE_SCOPES:
                rs = node + '/' + RESAMPLE_SCOPES[k]
                kernel(rs + '/conv2d/kernel', 1, 1, lateral_ch[k], FPN_CH)
                bn(rs + '/bn', FPN_CH)
            op = node + '/op_after_combine{}'.format(5 + k)
            sep(op + '/conv', FPN_CH, FPN_CH)
            bn(op + '/bn', FPN_CH)

    # --- heads ---
    for net, prefix, out in (('class_net', 'class', ANCHORS * NUM_CLASSES),
                             ('box_net', 'box', ANCHORS * 4)):
        for r in range(HEAD_REPEATS):
            sep('{}/{}-{}'.format(net, prefix, r), FPN_CH, FPN_CH)
            for level in range(3, 8):
                bn('{}/{}-{}-bn-{}'.format(net, prefix, r, level), FPN_CH)
        sep('{}/{}-predict'.format(net, prefix), FPN_CH, out)
    return v


def _tf_forward(v, images):
    """Independent automl-Lite forward (inference mode) in plain TF ops."""
    g = {name: tf.constant(a) for name, a in v.items()}
    relu6 = tf.nn.relu6

    def conv(x, name, stride=1):
        return tf.nn.conv2d(x, g[name], strides=[1, stride, stride, 1],
                            padding='SAME')

    def dwconv(x, name, stride=1):
        return tf.nn.depthwise_conv2d(x, g[name],
                                      strides=[1, stride, stride, 1],
                                      padding='SAME')

    def bn(x, scope):
        return tf.nn.batch_normalization(
            x, g[scope + '/moving_mean'], g[scope + '/moving_variance'],
            g[scope + '/beta'], g[scope + '/gamma'], 1e-3)

    def sep(x, scope):
        x = dwconv(x, scope + '/depthwise_kernel')
        x = conv(x, scope + '/pointwise_kernel')
        return x + g[scope + '/bias']

    def pool(x):
        return tf.nn.max_pool2d(x, 3, 2, 'SAME')

    def upsample(x, hw):
        return tf.image.resize(x, hw, method='nearest')

    # backbone
    x = relu6(bn(conv(images, ROOT + 'stem/conv2d/kernel', 2),
                 ROOT + 'stem/tpu_batch_normalization'))
    taps = {}
    blocks = lite_block_args(VARIANT)
    for i, (expand, cout, stride, _, stage) in enumerate(blocks):
        scope = ROOT + 'blocks_{}'.format(i)
        inp = x
        if expand != 1:
            x = relu6(bn(conv(x, scope + '/conv2d/kernel'),
                         scope + '/tpu_batch_normalization'))
            dw_bn, proj_conv, proj_bn = '_1', '/conv2d_1/kernel', '_2'
        else:
            dw_bn, proj_conv, proj_bn = '', '/conv2d/kernel', '_1'
        x = relu6(bn(dwconv(x, scope + '/depthwise_conv2d/depthwise_kernel',
                            stride),
                     scope + '/tpu_batch_normalization' + dw_bn))
        x = bn(conv(x, scope + proj_conv),
               scope + '/tpu_batch_normalization' + proj_bn)
        if stride == 1 and inp.shape[-1] == x.shape[-1]:
            x = x + inp
        last_of_stage = (i + 1 == len(blocks) or blocks[i + 1][4] != stage)
        if last_of_stage and stage in (2, 4, 6):
            taps[stage] = x
    c3, c4, c5 = taps[2], taps[4], taps[6]

    # FPN
    p6 = pool(bn(conv(c5, 'resample_p6/conv2d/kernel'), 'resample_p6/bn'))
    p7 = pool(p6)
    feats = [c3, c4, c5, p6, p7]
    for r in range(FPN_REPEATS):
        cell = 'fpn_cells/cell_{}'.format(r)

        def fuse(k, inputs, resample_idx=None):
            xs = list(inputs)
            if r == 0 and resample_idx is not None:
                rs = '{}/fnode{}/{}'.format(cell, k, RESAMPLE_SCOPES[k])
                xs[resample_idx] = bn(conv(xs[resample_idx],
                                           rs + '/conv2d/kernel'),
                                      rs + '/bn')
            y = relu6(tf.add_n(xs))
            op = '{}/fnode{}/op_after_combine{}'.format(cell, k, 5 + k)
            return bn(sep(y, op + '/conv'), op + '/bn')

        p3, p4, p5, p6, p7 = feats
        hw = [tuple(f.shape[1:3]) for f in feats]
        p6td = fuse(0, [p6, upsample(p7, hw[3])])
        p5td = fuse(1, [p5, upsample(p6td, hw[2])], 0)
        p4td = fuse(2, [p4, upsample(p5td, hw[1])], 0)
        p3out = fuse(3, [p3, upsample(p4td, hw[0])], 0)
        p4out = fuse(4, [p4, p4td, pool(p3out)], 0)
        p5out = fuse(5, [p5, p5td, pool(p4out)], 0)
        p6out = fuse(6, [p6, p6td, pool(p5out)])
        p7out = fuse(7, [p7, pool(p6out)])
        feats = [p3out, p4out, p5out, p6out, p7out]

    # heads
    def head(net, prefix, per_anchor):
        outs = []
        for li, feat in enumerate(feats):
            x = feat
            for rr in range(HEAD_REPEATS):
                x = sep(x, '{}/{}-{}'.format(net, prefix, rr))
                x = bn(x, '{}/{}-{}-bn-{}'.format(net, prefix, rr, 3 + li))
                x = relu6(x)
            x = sep(x, '{}/{}-predict'.format(net, prefix))
            outs.append(tf.reshape(x, (x.shape[0], -1, per_anchor)))
        return tf.concat(outs, axis=1)

    return head('box_net', 'box', 4), head('class_net', 'class', NUM_CLASSES)


def _write_checkpoint(variables, prefix):
    """A genuine TF checkpoint (V2 format) under the given names — exactly
    what tf.train.load_checkpoint reads from the public tarball."""
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
def ckpt_rig(tmp_path_factory):
    variables = _make_variables()
    prefix = str(tmp_path_factory.mktemp('effdet_ckpt') / 'model.ckpt')
    _write_checkpoint(variables, prefix)
    return variables, prefix


def test_config_inference(ckpt_rig):
    from watsor_tpu.models.convert_effdet import (convert_automl_effdet_checkpoint)
    _, prefix = ckpt_rig
    _, cfg = convert_automl_effdet_checkpoint(prefix)
    assert cfg.variant == VARIANT
    assert cfg.fpn_channels == FPN_CH
    assert cfg.fpn_repeats == FPN_REPEATS
    assert cfg.head_repeats == HEAD_REPEATS
    assert cfg.num_classes == NUM_CLASSES
    assert cfg.fpn_weight_method == 'sum'
    assert not cfg.explicit_background


def test_checkpoint_converts_and_matches_tf_outputs(ckpt_rig):
    from watsor_tpu.models.convert_effdet import (
        convert_automl_effdet_checkpoint)
    variables_np, prefix = ckpt_rig
    tree, cfg = convert_automl_effdet_checkpoint(prefix)
    cfg = cfg._replace(input_size=INPUT, dtype=jnp.float32)

    rng = np.random.default_rng(42)
    raw = rng.integers(0, 256, (1, INPUT, INPUT, 3)).astype(np.float32)
    image = (raw - 127.0) / 128.0

    tf_box, tf_cls = _tf_forward(variables_np, tf.constant(image))
    det = build_effdet(cfg, params=tree)
    jx_box, jx_cls = det.raw_apply(tree, jnp.asarray(image))

    assert jx_box.shape == tuple(tf_box.shape)
    assert jx_cls.shape == tuple(tf_cls.shape)
    np.testing.assert_allclose(np.asarray(jx_box), tf_box.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jx_cls), tf_cls.numpy(),
                               atol=2e-3, rtol=2e-3)


def test_cli_roundtrip_into_zoo(ckpt_rig, tmp_path):
    """The documented path: convert CLI (family auto-detect) -> model dir
    -> zoo loads it with the checkpoint's geometry adopted."""
    from watsor_tpu.models import convert
    variables_np, prefix = ckpt_rig
    out_dir = str(tmp_path / 'model')
    convert.main(['-c', prefix, '-o', out_dir])

    import os
    assert os.path.exists(
        os.path.join(out_dir, 'efficientdet_lite0.msgpack'))

    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('efficientdet_lite0', out_dir, dtype=jnp.float32)
    assert det.config.num_classes == NUM_CLASSES
    assert det.config.fpn_channels == FPN_CH
    assert det.config.fpn_repeats == FPN_REPEATS
    assert det.config.head_repeats == HEAD_REPEATS
    # adopted (not random) weights: the predict bias must match the ckpt
    bias = np.asarray(det.params['params']['cls_head']['predict']['pw']
                      ['bias'])
    np.testing.assert_allclose(bias,
                               variables_np['class_net/class-predict/bias'],
                               atol=0)
    # smoke the jitted end-to-end path (decode + NMS trace) — a geometry
    # mismatch in the adopted config only surfaces at first detection
    frames = np.zeros((1, det.config.input_size, det.config.input_size, 3),
                      np.uint8)
    out = det.detect_batch(det.params, jnp.asarray(frames))
    assert out.boxes.shape[0] == 1 and out.boxes.shape[-1] == 4


def test_missing_variable_is_reported(ckpt_rig):
    from watsor_tpu.models.convert import (MissingVariable,
                                           load_tf_checkpoint_variables)
    from watsor_tpu.models.convert_effdet import (
        automl_effdet_variables_to_flax, infer_effdet_config)
    _, prefix = ckpt_rig
    variables = load_tf_checkpoint_variables(prefix)
    cfg = infer_effdet_config(variables)
    del variables['fpn_cells/cell_1/fnode3/op_after_combine8/conv/bias']
    with pytest.raises(MissingVariable):
        automl_effdet_variables_to_flax(variables, cfg)
