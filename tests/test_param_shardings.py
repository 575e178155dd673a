"""Sharding-rule regressions (parallel/mesh.param_shardings).

The round-4 production-geometry dryrun caught the fleet path crashing on
the REAL zoo model: the 90-class cls_head kernel has 3x91=273 output
channels — odd, so it cannot split over a model axis of 2. Head kernels
must shard only when their out-channel dim divides the model axis and
replicate otherwise.
"""

import numpy as np
import pytest

import jax

from watsor_tpu.parallel.mesh import MODEL_AXIS, make_mesh, param_shardings

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def test_odd_channel_head_kernel_replicates():
    mesh = make_mesh(8, model_parallel=2)
    params = {'params': {
        'box_head0': {'kernel': np.zeros((3, 3, 576, 12), np.float32)},
        'cls_head0': {'kernel': np.zeros((3, 3, 576, 273), np.float32)},
    }}
    tree = param_shardings(mesh, params)
    box = tree['params']['box_head0']['kernel'].spec
    cls = tree['params']['cls_head0']['kernel'].spec
    assert box[-1] == MODEL_AXIS, 'divisible head kernels still shard'
    assert all(axis is None for axis in cls), \
        '273 % 2 != 0: the cls head must replicate, not crash'
    # and device_put must actually succeed with the produced shardings
    jax.device_put(params['params']['cls_head0']['kernel'],
                   tree['params']['cls_head0']['kernel'])
    jax.device_put(params['params']['box_head0']['kernel'],
                   tree['params']['box_head0']['kernel'])


def test_non_head_kernels_replicate():
    mesh = make_mesh(8, model_parallel=2)
    params = {'params': {
        'backbone': {'conv0': {'kernel':
                               np.zeros((3, 3, 32, 64), np.float32)}}}}
    tree = param_shardings(mesh, params)
    spec = tree['params']['backbone']['conv0']['kernel'].spec
    assert all(axis is None for axis in spec)
