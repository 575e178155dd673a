"""TFLite flatbuffer conversion: the reference's cpu.tflite/edgetpu.tflite
model files -> Flax detector with numerically matching raw outputs.

The rig converts a faithful Keras SSD-MobileNetV2 (the one proven against
TF-OD-API naming in test_convert_head.py) into a REAL .tflite flatbuffer
with the TFLite converter — BN folding, name mangling and all — then
appends a genuine ``TFLite_Detection_PostProcess`` custom op (anchors
constant + flexbuffer options) so the file is structurally identical to
the detect.tflite graphs the reference consumes
(/root/reference/watsor/detection/tensorflow_lite_cpu.py,
edge_tpu.py). The importer must walk the op graph structurally (names are
mangled), recover every conv, adopt the stored anchors/box-coder scales,
and reproduce the Keras raw outputs.
"""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

import test_convert_head as tch  # noqa: E402  (the proven Keras SSD rig)

from watsor_tpu.models.ssd import SSDConfig, anchors_for, build_detector  # noqa: E402

CFG = SSDConfig(num_classes=tch.NUM_CLASSES, dtype=jnp.float32)
SCALES = (10.0, 10.0, 5.0, 5.0)


def _corners_to_center(anchors):
    ymin, xmin, ymax, xmax = [anchors[:, i] for i in range(4)]
    h = ymax - ymin
    w = xmax - xmin
    return np.stack([ymin + 0.5 * h, xmin + 0.5 * w, h, w],
                    axis=-1).astype(np.float32)


def _append_postprocess(tflite_bytes, anchors_center, num_classes):
    """Flatbuffer surgery: add the TFLite_Detection_PostProcess custom op
    exactly as export_tflite_ssd_graph emits it (anchors constant input,
    flexbuffer options, 4 outputs)."""
    import flatbuffers
    from flatbuffers import flexbuffers
    from tensorflow.lite.python import schema_py_generated as schema_fb

    model = schema_fb.ModelT.InitFromPackedBuf(bytearray(tflite_bytes), 0)
    sub = model.subgraphs[0]
    outs = list(sub.outputs)
    shapes = [list(sub.tensors[t].shape) for t in outs]
    assert len(outs) == 2
    box_t, cls_t = (outs if shapes[0][-1] == 4 else outs[::-1])

    anchors_buf = schema_fb.BufferT()
    anchors_buf.data = np.frombuffer(anchors_center.tobytes(), np.uint8)
    model.buffers.append(anchors_buf)
    anchor_tensor = schema_fb.TensorT()
    anchor_tensor.shape = list(anchors_center.shape)
    anchor_tensor.type = schema_fb.TensorType.FLOAT32
    anchor_tensor.buffer = len(model.buffers) - 1
    anchor_tensor.name = b'anchors'
    sub.tensors.append(anchor_tensor)
    anchors_idx = len(sub.tensors) - 1

    def out_tensor(name, shape):
        t = schema_fb.TensorT()
        t.shape = shape
        t.type = schema_fb.TensorType.FLOAT32
        t.buffer = 0
        t.name = name.encode()
        sub.tensors.append(t)
        return len(sub.tensors) - 1

    outputs = [out_tensor('TFLite_Detection_PostProcess', [1, 10, 4]),
               out_tensor('TFLite_Detection_PostProcess:1', [1, 10]),
               out_tensor('TFLite_Detection_PostProcess:2', [1, 10]),
               out_tensor('TFLite_Detection_PostProcess:3', [1])]

    oc = schema_fb.OperatorCodeT()
    oc.builtinCode = schema_fb.BuiltinOperator.CUSTOM
    oc.deprecatedBuiltinCode = schema_fb.BuiltinOperator.CUSTOM
    oc.customCode = b'TFLite_Detection_PostProcess'
    oc.version = 1
    model.operatorCodes.append(oc)

    op = schema_fb.OperatorT()
    op.opcodeIndex = len(model.operatorCodes) - 1
    op.inputs = [box_t, cls_t, anchors_idx]
    op.outputs = outputs
    op.customOptions = np.frombuffer(flexbuffers.Dumps({
        'max_detections': 10, 'max_classes_per_detection': 1,
        'nms_score_threshold': 0.3, 'nms_iou_threshold': 0.6,
        'num_classes': num_classes, 'y_scale': SCALES[0],
        'x_scale': SCALES[1], 'h_scale': SCALES[2], 'w_scale': SCALES[3],
    }), np.uint8)
    sub.operators.append(op)
    sub.outputs = outputs

    builder = flatbuffers.Builder(1024)
    builder.Finish(model.Pack(builder), b'TFL3')
    return bytes(builder.Output())


@pytest.fixture(scope='module')
def tflite_rig():
    model = tch._build_tf_ssd()
    tch._randomize(model)
    converter = tf.lite.TFLiteConverter.from_keras_model(model)
    raw = converter.convert()
    anchors_center = _corners_to_center(anchors_for(CFG))
    detect = _append_postprocess(raw, anchors_center, tch.NUM_CLASSES)
    return model, raw, detect


def test_detect_tflite_converts_and_matches_keras(tflite_rig):
    from watsor_tpu.models.convert_tflite import convert_tflite_ssd
    model, _, detect = tflite_rig
    tree, cfg, anchors = convert_tflite_ssd(model_content=detect)

    assert cfg.num_classes == tch.NUM_CLASSES
    assert cfg.head_kernel == 3
    assert not cfg.lite
    assert cfg.backbone == 'mobilenet_v2'
    assert tuple(cfg.box_coder_scales) == SCALES
    np.testing.assert_allclose(anchors, anchors_for(CFG), atol=1e-6)

    rng = np.random.default_rng(7)
    image = rng.uniform(-1.0, 1.0, (1, 300, 300, 3)).astype(np.float32)
    tf_box, tf_cls = model(image, training=False)
    det = build_detector(cfg._replace(dtype=jnp.float32), params=tree,
                         anchors=anchors)
    jx_box, jx_cls = det.raw_apply(tree, jnp.asarray(image))
    np.testing.assert_allclose(np.asarray(jx_box), tf_box.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jx_cls), tf_cls.numpy(),
                               atol=2e-3, rtol=2e-3)


def test_raw_tflite_without_postprocess(tflite_rig):
    """Raw two-output exports convert too (generated anchors apply)."""
    from watsor_tpu.models.convert_tflite import convert_tflite_ssd
    _, raw, _ = tflite_rig
    tree, cfg, anchors = convert_tflite_ssd(model_content=raw)
    assert anchors is None
    assert cfg.num_classes == tch.NUM_CLASSES
    assert 'backbone' in tree['params']


def test_quantized_weights_dequantize(tflite_rig):
    """Dynamic-range quantization (per-channel int8 weights — the
    edgetpu.tflite storage format) dequantizes to near-float outputs."""
    model, _, _ = tflite_rig
    converter = tf.lite.TFLiteConverter.from_keras_model(model)
    converter.optimizations = [tf.lite.Optimize.DEFAULT]
    quant = converter.convert()
    from watsor_tpu.models.convert_tflite import convert_tflite_ssd
    tree, cfg, _ = convert_tflite_ssd(model_content=quant)

    rng = np.random.default_rng(7)
    image = rng.uniform(-1.0, 1.0, (1, 300, 300, 3)).astype(np.float32)
    tf_box, tf_cls = model(image, training=False)
    det = build_detector(cfg._replace(dtype=jnp.float32), params=tree)
    jx_box, jx_cls = det.raw_apply(tree, jnp.asarray(image))

    def cosine(a, b):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        return float(np.dot(a, b) /
                     (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    assert cosine(jx_box, tf_box.numpy()) > 0.99
    assert cosine(jx_cls, tf_cls.numpy()) > 0.99


def test_cli_roundtrip_into_zoo(tflite_rig, tmp_path):
    """convert CLI on a .tflite -> msgpack with the postprocess sidecar ->
    zoo adopts weights AND the stored anchor grid."""
    from watsor_tpu.models import convert
    model, _, detect = tflite_rig
    tfl_path = str(tmp_path / 'cpu.tflite')
    with open(tfl_path, 'wb') as f:
        f.write(detect)
    out_dir = str(tmp_path / 'model')
    convert.main(['-c', tfl_path, '-o', out_dir])

    import os
    assert os.path.exists(os.path.join(out_dir, 'ssd_mobilenet_v2.msgpack'))

    from watsor_tpu.models.zoo import build_from_zoo
    det = build_from_zoo('ssd_mobilenet_v2', out_dir, dtype=jnp.float32)
    assert det.config.num_classes == tch.NUM_CLASSES
    np.testing.assert_allclose(det.anchors, anchors_for(CFG), atol=1e-6)
    # adopted weights: the head biases ride in identity-BN shifts; check a
    # predictor bias (stored verbatim)
    rng = np.random.default_rng(7)
    image = rng.uniform(-1.0, 1.0, (1, 300, 300, 3)).astype(np.float32)
    tf_box, _ = model(image, training=False)
    jx_box, _ = det.raw_apply(det.params, jnp.asarray(image))
    np.testing.assert_allclose(np.asarray(jx_box), tf_box.numpy(),
                               atol=2e-3, rtol=2e-3)
