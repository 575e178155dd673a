"""Roofline/MFU accounting (watsor_tpu/roofline.py) — the math bench.py
and scripts/roofline.py trust for the BENCHMARKS.md percent-of-peak
claims. The reference ships no benchmark suite at all (BASELINE.md), so
this subsystem has no reference counterpart to diff against; these tests
pin its arithmetic and its integration with XLA's cost model instead.
"""

import jax
import jax.numpy as jnp
import pytest

from watsor_tpu.roofline import device_peaks, roofline_row, step_cost


class _FakeDevice:
    def __init__(self, kind):
        self.device_kind = kind


def test_device_peaks_v5e_and_unknown(monkeypatch):
    monkeypatch.delenv('WATSOR_PEAK_TFLOPS', raising=False)
    monkeypatch.delenv('WATSOR_PEAK_GBPS', raising=False)
    assert device_peaks(_FakeDevice('TPU v5 lite')) == (197.0, 819.0)
    assert device_peaks(_FakeDevice('cpu')) == (None, None)
    monkeypatch.setenv('WATSOR_PEAK_TFLOPS', '100')
    monkeypatch.setenv('WATSOR_PEAK_GBPS', '500')
    assert device_peaks(_FakeDevice('cpu')) == (100.0, 500.0)


def test_roofline_row_memory_bound():
    # 1 GFLOP, 1 GB moved, 10 ms on a 197 TF / 819 GB/s part:
    # intensity 1 << ridge (~240) -> memory bound; SOL = 1 GB / 819 GB/s
    row = roofline_row('m', 32, 10.0, 1e9, 1e9, _FakeDevice('TPU v5 lite'))
    assert row['bound'] == 'memory'
    assert row['frames_per_s'] == 3200.0
    assert row['arithmetic_intensity'] == 1.0
    assert row['speed_of_light_ms'] == pytest.approx(1000.0 / 819.0,
                                                     abs=5e-3)
    # achieved GB/s = 1 GB / 10 ms = 100 GB/s = 12.2% of peak, and for a
    # memory-bound row pct_speed_of_light IS pct_peak_bw
    assert row['achieved_gbps'] == 100.0
    assert row['pct_peak_bw'] == pytest.approx(12.2, abs=0.1)
    assert row['pct_speed_of_light'] == pytest.approx(row['pct_peak_bw'],
                                                      abs=0.1)


def test_roofline_row_compute_bound():
    # intensity 1000 >> ridge -> compute bound; SOL = flops / peak_flops
    row = roofline_row('m', 1, 1.0, 1e12, 1e9, _FakeDevice('TPU v5 lite'))
    assert row['bound'] == 'compute'
    assert row['speed_of_light_ms'] == pytest.approx(1000.0 / 197.0,
                                                     abs=5e-2)
    assert row['pct_speed_of_light'] == pytest.approx(
        row['pct_peak_flops'], abs=0.1)


def test_roofline_row_unknown_device_omits_peaks():
    row = roofline_row('m', 8, 2.0, 1e9, 1e8, _FakeDevice('cpu'))
    assert 'bound' not in row and 'pct_peak_bw' not in row
    assert row['achieved_tflops'] == 0.5
    assert row['gflops_per_frame'] == 0.12        # 0.125 at 2-dp rounding


def test_step_cost_counts_real_flops():
    # a [256,256]x[256,256] matmul is 2*256^3 = 33.6 MFLOP; XLA's cost
    # model on CPU reports it (plus epsilon for the add)
    @jax.jit
    def step(a, b):
        return a @ b + 1.0

    a = jnp.ones((256, 256), jnp.float32)
    flops, hbm = step_cost(step, a, a)
    assert flops is not None and hbm is not None
    assert flops >= 2 * 256 ** 3
    assert flops < 4 * 256 ** 3
    # traffic at least the three [256,256] f32 buffers
    assert hbm >= 3 * 256 * 256 * 4


def test_step_cost_unjitted_returns_none():
    flops, hbm = step_cost(lambda x: x, jnp.ones(3))
    assert flops is None and hbm is None
