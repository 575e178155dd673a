"""Multi-chip execution: the sharded fleet detection step and the sharded
training step.

Pure data parallelism over the camera batch (the reference's N-detector
load balancing, SURVEY.md §2.3) plus tensor parallelism over the SSD head
channels. Both steps are single jitted programs; shardings are installed on
the arrays (``jax.device_put`` with NamedSharding) and GSPMD propagates
them through the computation, laying the collectives over ICI.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from watsor_tpu.models.ssd import SSDConfig, build_detector
from watsor_tpu.models.train import TrainState, init_train_state, \
    make_optimizer, make_train_step
from watsor_tpu.parallel.mesh import batch_sharding, param_shardings


class FleetDetector:
    """A detector whose batch axis spans every chip of a mesh.

    ``detect(frames)`` accepts [B, H, W, 3] uint8 with B divisible by the
    data-axis size; each chip runs the fused step on its shard of the
    camera batch.
    """

    def __init__(self, mesh, config: SSDConfig = SSDConfig(), rng=None,
                 model_parallel=True, params=None, anchors=None,
                 detector=None):
        self.mesh = mesh
        self.config = config
        if detector is not None:
            # adopt a prebuilt detector (zoo-loaded weights, EfficientDet,
            # ...) instead of re-initializing — main.py passes the one it
            # built so stored weights survive fleet mode
            self.detector = detector
        else:
            self.detector = build_detector(config, rng=rng, params=params,
                                           anchors=anchors)
        self.params = jax.device_put(
            self.detector.params,
            param_shardings(mesh, self.detector.params, model_parallel))
        self._step = self.detector.detect_batch  # jitted; follows shardings

    def shard_batch(self, frames_u8):
        return jax.device_put(frames_u8,
                              batch_sharding(self.mesh, frames_u8.ndim))

    def detect(self, frames_u8):
        return self._step(self.params, self.shard_batch(frames_u8))


def make_sharded_train_step(mesh, config: SSDConfig, rng=None,
                            learning_rate=1e-3, model_parallel=True):
    """Build ``(state, step, shard_batch)``: the full SSD training step
    (device resize + forward + anchor matching + focal/huber loss + adamw
    update) over the mesh. Parameters AND optimizer moments carry the same
    shardings (head kernels split over ``model``, rest replicated), the
    batch is sharded over ``data``; the jitted step donates the state so
    updates happen in place.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tx = make_optimizer(learning_rate)
    state = init_train_state(config, rng, tx)
    step_fn = make_train_step(config, tx)

    state = TrainState(
        params=jax.device_put(
            state.params,
            param_shardings(mesh, state.params, model_parallel)),
        opt_state=jax.device_put(
            state.opt_state,
            param_shardings(mesh, state.opt_state, model_parallel)),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )

    def shard_batch(batch):
        return {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                for k, v in batch.items()}

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return state, jitted, shard_batch
