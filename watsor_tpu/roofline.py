"""Roofline / MFU accounting for the fused detection step.

Turns "the forward is memory-bound" style claims into checkable numbers
(the reference ships no benchmark suite at all — BASELINE.md): per model,
the XLA cost analysis of the exact compiled program (FLOPs + HBM bytes
accessed) is combined with the measured step time into achieved TFLOP/s,
GB/s, and percent-of-peak on the serving hardware, plus the arithmetic
intensity verdict (which wall the model is against).

Used by ``bench.py`` (headline MFU columns) and ``scripts/roofline.py``
(the full 9-model table in BENCHMARKS.md).
"""

import os

# Peak specs by PJRT device_kind substring. v5e: 197 bf16 TFLOP/s MXU peak,
# 819 GB/s HBM (public TPU v5e datasheet figures). Override with
# WATSOR_PEAK_TFLOPS / WATSOR_PEAK_GBPS for other parts.
_PEAKS = (
    ('v5 lite', (197.0, 819.0)),
    ('v5litepod', (197.0, 819.0)),
    ('v5e', (197.0, 819.0)),
    ('v5p', (459.0, 2765.0)),
    ('v4', (275.0, 1228.0)),
    ('v6', (918.0, 1640.0)),        # trillium
)


def device_peaks(device):
    """(peak_tflops, peak_hbm_gbps) for a jax device, env-overridable;
    (None, None) when unknown (e.g. the CPU backend)."""
    tflops = os.environ.get('WATSOR_PEAK_TFLOPS')
    gbps = os.environ.get('WATSOR_PEAK_GBPS')
    if tflops and gbps:
        return float(tflops), float(gbps)
    kind = getattr(device, 'device_kind', '').lower()
    for needle, peaks in _PEAKS:
        if needle in kind:
            return peaks
    return None, None


def step_cost(jitted, *args):
    """XLA's cost analysis of the compiled program: (flops, hbm_bytes).

    ``bytes accessed`` is XLA's estimate of memory traffic across fusion
    boundaries — on TPU that is HBM traffic (VMEM-resident intermediates
    inside a fusion are not counted). Returns (None, None) when the
    backend doesn't expose a cost model."""
    try:
        compiled = jitted.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get('flops', 0.0))
        in_bytes = float(analysis.get('bytes accessed', 0.0))
        return (flops or None), (in_bytes or None)
    except Exception:
        return None, None


def roofline_row(model, batch, ms_per_step, flops, hbm_bytes, device):
    """One BENCHMARKS.md roofline row. All rates from measured wall time;
    percent-of-peak only when the device's peaks are known."""
    seconds = ms_per_step / 1000.0
    row = {
        'model': model,
        'batch': batch,
        'ms_per_step': round(ms_per_step, 2),
        'frames_per_s': round(batch / seconds, 1),
    }
    if flops:
        row['gflops_per_frame'] = round(flops / batch / 1e9, 2)
        row['achieved_tflops'] = round(flops / seconds / 1e12, 2)
    if hbm_bytes:
        row['hbm_mb_per_frame'] = round(hbm_bytes / batch / 1e6, 1)
        row['achieved_gbps'] = round(hbm_bytes / seconds / 1e9, 1)
    if flops and hbm_bytes:
        row['arithmetic_intensity'] = round(flops / hbm_bytes, 1)
    peak_tflops, peak_gbps = device_peaks(device)
    if peak_tflops and flops:
        row['pct_peak_flops'] = round(
            100.0 * flops / seconds / 1e12 / peak_tflops, 1)
    if peak_gbps and hbm_bytes:
        row['pct_peak_bw'] = round(
            100.0 * hbm_bytes / seconds / 1e9 / peak_gbps, 1)
    if peak_tflops and peak_gbps and flops and hbm_bytes:
        # the wall the model is against at this intensity: the machine's
        # ridge point is peak_flops/peak_bw
        ridge = peak_tflops * 1e12 / (peak_gbps * 1e9)
        row['bound'] = 'compute' if flops / hbm_bytes >= ridge else 'memory'
        # headroom: how much faster the step could run at 100% of the
        # binding resource (dispatch floors and serial stages eat the gap)
        limit_s = max(flops / (peak_tflops * 1e12),
                      hbm_bytes / (peak_gbps * 1e9))
        row['speed_of_light_ms'] = round(limit_s * 1000.0, 3)
        row['pct_speed_of_light'] = round(100.0 * limit_s / seconds, 1)
    return row
