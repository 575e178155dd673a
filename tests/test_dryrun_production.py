"""Production-geometry multi-chip legs (round-4 VERDICT #2) as CI tests:
the real 300^2 90-class zoo geometry through FleetBackend with device
filter tables + zone refiner + fused_exact NMS, the EfficientDet-Lite4
head/BiFPN geometry over the mesh, and the uneven-batch pad path — all on
the 8-virtual-device CPU mesh (tests/conftest.py).

These are the same legs __graft_entry__.dryrun_multichip runs; keeping
them as tests pins them against regressions without waiting for a driver
dryrun (the odd-channel head sharding crash they caught lived in
parallel/mesh.param_shardings).
"""

import numpy as np
import pytest

import jax

import __graft_entry__ as graft
from watsor_tpu.parallel.mesh import make_mesh

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason='needs 8 virtual devices'),
              # multi-minute CPU compiles; excluded from `make test-fast`
              pytest.mark.slow]


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(8, model_parallel=2)


def test_production_fleet_leg(mesh):
    graft._dryrun_production_fleet(mesh, np.random.RandomState(0))


def test_lite4_geometry_leg(mesh):
    graft._dryrun_lite4_fleet(mesh, np.random.RandomState(1))
