"""Multi-chip paths on the 8-virtual-device CPU mesh: sharded fleet
detection (including through the FleetBackend + ObjectDetector task) and
the sharded training step."""

import threading
from queue import Queue

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from watsor_tpu.detection.backend import FleetBackend
from watsor_tpu.detection.detector import ObjectDetector
from watsor_tpu.models.ssd import SSDConfig
from watsor_tpu.parallel.fleet import FleetDetector, make_sharded_train_step
from watsor_tpu.parallel.mesh import make_mesh, param_shardings
from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer

TINY = SSDConfig(num_classes=3, input_size=96, width_multiplier=0.35,
                 extra_features=(32, 32, 32, 32), dtype=jnp.float32)

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason='needs 8 virtual devices'),
              # timed >30 s on the 1-core CI host; not in `make test-fast`
              pytest.mark.slow]


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(8, model_parallel=2)


@pytest.fixture(scope='module')
def fleet(mesh):
    return FleetDetector(mesh, TINY, rng=jax.random.PRNGKey(0))


def test_head_kernels_sharded_over_model_axis(mesh, fleet):
    shardings = param_shardings(mesh, fleet.detector.params)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    sharded = [p for p, s in leaves
               if 'box_head' in jax.tree_util.keystr(p) and
               'model' in str(s.spec)]
    assert sharded, 'no head kernel sharded over the model axis'


def test_fleet_detect_shards_batch(mesh, fleet):
    frames = np.random.RandomState(0).randint(0, 255, (8, 96, 96, 3),
                                              np.uint8)
    out = fleet.detect(frames)
    assert out.boxes.shape == (8, TINY.max_detections, 4)
    # the output really is sharded over the data axis
    assert 'data' in str(out.boxes.sharding.spec) or \
        out.boxes.sharding.is_fully_replicated is False


def test_fleet_backend_pads_and_truncates(fleet):
    backend = FleetBackend(fleet)
    frames = np.random.RandomState(1).randint(0, 255, (3, 96, 96, 3),
                                              np.uint8)
    boxes, scores, classes, valid, ms = backend.detect_batch(frames)
    assert boxes.shape[0] == 3
    assert ms > 0


def test_fleet_backend_through_detector_task(fleet):
    stop = threading.Event()
    buffers = {'cam1': FrameBuffer(4, 96, 96)}
    queues = balanced_queue_group(['cam1'], maxsize=2)
    detector = ObjectDetector('det-fleet', queues['cam1'], buffers,
                              FleetBackend(fleet), stop_event=stop)
    sink = Queue(4)

    from watsor_tpu.runtime.frames import State
    frame = buffers['cam1'].frames[0]
    frame.image[:] = 128
    frame.stamp()
    # one confirmation (the detector's) gates DETECT -> PUBLISH here; the
    # publisher's half of the protocol is not part of this rig
    frame.latch.next(1)
    from watsor_tpu.runtime.tasks import Payload
    queues['cam1'].put(Payload('cam1', 0))

    detector.start()
    try:
        assert frame.latch.wait(State.PUBLISH, 30), \
            'detector never confirmed the frame'
    finally:
        stop.set()
        detector.join(5)


def test_sharded_train_step_runs(mesh):
    state, step, shard_batch = make_sharded_train_step(mesh, TINY)
    rng = np.random.RandomState(0)
    batch = shard_batch({
        'images': rng.randint(0, 255, (8, 96, 96, 3)).astype(np.uint8),
        'gt_boxes': np.tile(np.array([[0.2, 0.2, 0.6, 0.6]], np.float32),
                            (8, 2, 1)),
        'gt_labels': np.ones((8, 2), np.int32),
        'gt_valid': np.ones((8, 2), bool),
    })
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_fleet_adopts_prebuilt_detector_weights(mesh):
    """FleetDetector must carry the zoo-loaded weights, not re-initialize
    (main.py passes the detector it built — stored weights survive fleet
    mode)."""
    from watsor_tpu.models.ssd import build_detector
    cfg = SSDConfig(num_classes=3)
    base = build_detector(cfg, rng=jax.random.PRNGKey(7))
    fleet = FleetDetector(mesh, cfg, detector=base)
    leaf = jax.tree_util.tree_leaves(base.params)[0]
    fleet_leaf = jax.tree_util.tree_leaves(fleet.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(fleet_leaf))


def test_fleet_shards_efficientdet(mesh):
    """EfficientDet rides the same fleet path (the documented route for
    Lite4's two-chip 32x30 requirement, BENCHMARKS.md): main passes the
    prebuilt detector, the batch shards over the data axis."""
    from watsor_tpu.models.efficientdet import build_effdet, lite_config
    cfg = lite_config('lite0', num_classes=3, input_size=128,
                      dtype=jnp.float32)
    det = build_effdet(cfg)
    fleet = FleetDetector(mesh, cfg, detector=det)
    frames = np.zeros((8, 128, 128, 3), np.uint8)
    out = fleet.detect(jnp.asarray(frames))
    assert out.boxes.shape == (8, 100, 4)
    backend = FleetBackend(fleet)
    b, s, c, v, ms = backend.detect_batch(frames)
    assert b.shape == (8, 100, 4)


def test_fleet_detections_match_single_device(mesh):
    """Sharding the batch over the mesh must not change the math: fleet
    detections equal the single-device detector's on identical weights
    and frames (f32 so reduction order can't blur the comparison)."""
    from watsor_tpu.models.ssd import build_detector
    cfg = SSDConfig(num_classes=3, dtype=jnp.float32)
    det = build_detector(cfg, rng=jax.random.PRNGKey(11))
    fleet = FleetDetector(mesh, cfg, detector=det)
    frames = np.random.default_rng(5).integers(
        0, 255, (8, 300, 300, 3), np.uint8)
    single = det.detect_batch(det.params, jnp.asarray(frames))
    sharded = fleet.detect(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(single.boxes),
                               np.asarray(sharded.boxes),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(single.classes),
                                  np.asarray(sharded.classes))
    np.testing.assert_array_equal(np.asarray(single.valid),
                                  np.asarray(sharded.valid))
