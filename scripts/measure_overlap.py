"""Measure transfer/compute overlap with data, not arithmetic (VERDICT #9).

The detector pipelines H2D with compute (dispatch/resolve + ping-pong
staging, detection/backend.py) — the reference's CUDA-stream design
(/root/reference/watsor/detection/tensorrt_gpu.py:145-160) re-expressed in
JAX async dispatch. This script quantifies, on THIS rig:

  1. t_h2d(B):   uint8 batch transfer alone (device_put + block)
  2. t_step(B):  fused step alone, inputs pre-staged (device-resident)
  3. t_pipe(B):  achieved per-batch wall time with K=2 batches in flight,
                 fresh uint8 H2D every step (the production path)

  overlap_fraction = (t_h2d + t_step - t_pipe) / min(t_h2d, t_step)
     1.0 -> transfer fully hidden behind compute (or vice versa)
     0.0 -> fully serialized

Also regresses t_pipe(B) = a + b*B over batch sizes to split the fixed
per-step cost (dispatch + tunnel round trip) from the marginal per-frame
cost, giving a rig-independent estimate of uint8-in -> detections-out
throughput (1/b frames/s) with the environment's fixed cost factored out.

Writes one JSON line to OVERLAP_RESULTS (default /tmp/overlap_results.json).
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (4, 8, 16, 32)
STEPS = int(os.environ.get('BENCH_STEPS', 12))
OUT = os.environ.get('OVERLAP_RESULTS', '/tmp/overlap_results.json')


def main():
    import jax
    from watsor_tpu.models.ssd import SSDConfig, build_detector

    det = build_detector(SSDConfig())
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)
    size = det.config.input_size
    rng = np.random.default_rng(0)

    rows = []
    for B in BATCHES:
        host = [rng.integers(0, 255, (B, size, size, 3), np.uint8)
                for _ in range(3)]
        # warm the (B, size) program
        jax.block_until_ready(
            det.detect_batch(params, jax.device_put(host[0], device)))

        # 1. H2D alone
        t = perf_counter()
        for i in range(STEPS):
            jax.block_until_ready(jax.device_put(host[i % 3], device))
        t_h2d = (perf_counter() - t) / STEPS

        # 2. step alone (pre-staged inputs, dispatch back-to-back)
        staged = [jax.device_put(h, device) for h in host]
        outs = []
        t = perf_counter()
        for i in range(STEPS):
            outs.append(det.detect_batch(params, staged[i % 3]))
        jax.block_until_ready(outs[-1])
        t_step = (perf_counter() - t) / STEPS

        # 3. pipelined: 2 in flight, fresh H2D per step (async dispatch
        #    overlaps the transfer of batch N+1 with the step of batch N)
        inflight = []
        t = perf_counter()
        for i in range(STEPS):
            x = jax.device_put(host[i % 3], device)
            inflight.append(det.detect_batch(params, x))
            if len(inflight) > 1:
                jax.block_until_ready(inflight.pop(0))
        while inflight:
            jax.block_until_ready(inflight.pop(0))
        t_pipe = (perf_counter() - t) / STEPS

        denom = min(t_h2d, t_step)
        overlap = (t_h2d + t_step - t_pipe) / denom if denom > 0 else 0.0
        rows.append({'batch': B,
                     'h2d_ms': round(t_h2d * 1e3, 2),
                     'step_ms': round(t_step * 1e3, 2),
                     'pipelined_ms': round(t_pipe * 1e3, 2),
                     'overlap_fraction': round(overlap, 3),
                     'pipelined_fps': round(B / t_pipe, 1)})
        print('batch {}: h2d {:.1f}ms step {:.1f}ms pipe {:.1f}ms '
              'overlap {:.2f}'.format(B, t_h2d * 1e3, t_step * 1e3,
                                      t_pipe * 1e3, overlap),
              file=sys.stderr, flush=True)

    # fixed-vs-marginal split: least squares t_pipe = a + b*B
    bs = np.array([r['batch'] for r in rows], np.float64)
    ts = np.array([r['pipelined_ms'] for r in rows], np.float64)
    b_slope, a_fixed = np.polyfit(bs, ts, 1)
    record = {
        'metric': 'transfer/compute overlap, SSD300 fused step',
        'rows': rows,
        'fixed_cost_ms': round(float(a_fixed), 2),
        'marginal_ms_per_frame': round(float(b_slope), 4),
        'fixed_cost_corrected_fps': round(1000.0 / b_slope, 1)
        if b_slope > 0 else None,
        'device': str(jax.devices()[0].device_kind),
    }
    line = json.dumps(record)
    print(line, flush=True)
    with open(OUT, 'w') as f:
        f.write(line + '\n')


if __name__ == '__main__':
    main()
