"""Device mesh + sharding rules.

The reference scales across accelerators by spawning one detector process
per device sharing a fairness queue (/root/reference/watsor/detection/
detector.py:40-50) and across hosts by whole-instance replication. The
TPU-native scale-out is SPMD: one controller, a ``Mesh`` over the chips,
the camera batch sharded along ``data``, and the SSD prediction-head
channels (the widest matmuls) optionally sharded along ``model`` — XLA
inserts the ICI collectives.
"""

import re

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

# Flax param paths whose kernels are wide enough to be worth splitting over
# the model axis (output-channel dimension of the SSD head convs).
_MODEL_SHARDED_KERNEL = re.compile(r'(box_head|cls_head)\d+$')


def make_mesh(n_devices=None, model_parallel=1, devices=None) -> Mesh:
    """A (data, model) mesh over the first ``n_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, \
        "{} devices not divisible by model_parallel={}".format(
            n, model_parallel)
    grid = mesh_utils.create_device_mesh(
        (n // model_parallel, model_parallel),
        devices=np.asarray(devices).reshape(-1))
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_shardings(mesh: Mesh, params, model_parallel: bool = True):
    """NamedSharding tree for a parameter pytree: SSD head conv kernels are
    split over the model axis on their output-channel dim; everything else
    is replicated (the backbone is small — batch sharding is the win)."""

    def _key(entry):
        # DictKey has .key; GetAttrKey (NamedTuple fields, e.g. the int8
        # QUnit packs) has .name; SequenceKey has .idx — crash-free on any
        # pytree the fleet may carry
        return str(getattr(entry, 'key', getattr(entry, 'name',
                                                 getattr(entry, 'idx', ''))))

    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def spec_for(path, leaf):
        if model_parallel and getattr(leaf, 'ndim', 0) == 4:
            parent = _key(path[-2]) if len(path) >= 2 else ''
            name = _key(path[-1]) if path else ''
            if name == 'kernel' and _MODEL_SHARDED_KERNEL.search(parent):
                # a kernel only shards if its out-channel dim divides the
                # model axis: the production 90-class cls_head is 3x91=273
                # channels (odd) — replicate it, shard the rest (the
                # box_head's 3x4=12 still splits). Caught by the round-4
                # production-geometry dryrun; without this the whole fleet
                # path crashed on any odd-channel head.
                if leaf.shape[-1] % model_size == 0:
                    return P(None, None, None, MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (camera-batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
