"""Application-level fleet equality: the 32-camera graph (zones + fused
device filters + exact zone refinement + device render + MQTT) runs once
with WATSOR_FLEET=1 (one SPMD step over the 8-virtual-device CPU mesh) and
once single-device, and must publish IDENTICAL detections camera by camera.

Round-2 pinning of fleet-vs-single equality stopped at the backend
(tests/test_fleet.py); this closes the loop at the surface an operator
sees — the MQTT detail payloads — through the REAL composition root. The
``synthetic://static`` source makes the comparison well-defined: every
frame of a camera carries identical pixels, so two runs converge to the
same steady-state detections regardless of timing, drops or batch
composition. TRT_FLOAT_PRECISION=32 removes bfloat16 reduction-order blur
(as the backend-level equality test does).

The boot/collect rig lives in watsor_tpu/testing/fleet_app.py, shared with
``__graft_entry__.dryrun_multichip``'s app-topology leg."""

import pytest

import jax

from watsor_tpu.models import zoo
from watsor_tpu.models.ssd import build_detector
from watsor_tpu.testing.fleet_app import run_app, tiny_ssd_config

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason='needs 8 virtual devices')]

N_CAMS = 32


def _run_app(tmp_path, fleet):
    return run_app(str(tmp_path), fleet, n_cams=N_CAMS)


@pytest.fixture(scope='module', autouse=True)
def tiny_model_registered():
    zoo.MODEL_REGISTRY['ssd_tiny_test'] = (build_detector, tiny_ssd_config())
    yield
    zoo.MODEL_REGISTRY.pop('ssd_tiny_test', None)


def test_fleet_app_equals_single_device(tmp_path):
    fleet_details, fleet_name = _run_app(tmp_path, fleet=True)
    single_details, single_name = _run_app(tmp_path, fleet=False)

    # the fleet run really took the SPMD path
    assert 'MESH' in fleet_name, fleet_name
    assert 'MESH' not in single_name, single_name

    # detection-for-detection equality at the operator surface, every
    # camera that reported in both runs (>= 3/4 of them each)
    common = sorted(set(fleet_details) & set(single_details))
    assert len(common) >= N_CAMS // 2, (
        'too few cameras to compare: {}'.format(common))
    mismatches = {
        key: (fleet_details[key], single_details[key])
        for key in common if fleet_details[key] != single_details[key]}
    assert not mismatches, (
        'fleet and single-device detections diverge on {} of {} cameras; '
        'first: {}'.format(len(mismatches), len(common),
                           next(iter(sorted(mismatches.items())))))
