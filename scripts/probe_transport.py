"""Transport decomposition for the frame->detection latency story.

LATENCY_SWEEP.jsonl's best silicon p50 (70.2 ms, 1 camera 1080p, low
load) is dominated by the tunnel, which a PCIe host does not have. The
round-3 VERDICT (#1) asks for "a quantified proof of exactly how much of
the residual is tunnel RTT vs pipeline, with the host-PCIe projection
stated from measured components". This probe measures every component of
one detection step, in one process, at the low-load bucket:

  1. chip_step_ms   - pure on-device step time (chained harness,
                      watsor_tpu/timing.py - immune to the rig's replay
                      and early-readiness artifacts)
  2. rtt_ms         - tunnel round trip (tiny put + scalar fetch)
  3. h2d_wall_ms    - device_put wall for one staged batch (fresh bytes
                      per rep; block_until_ready, then +1-element fetch
                      as a stricter landed-bytes bound)
  4. dispatch_wall_ms - issuing the fused step on RESIDENT input without
                      blocking (the RPC issue cost; alternating inputs
                      defeat identical-dispatch replay)
  5. fetch_wall_ms  - one packed-result fetch AFTER the step finished
                      (sleep first), i.e. pure D2H of the packed array
  6. e2e_wall_ms    - the real backend dispatch()+resolve() wall on
                      fresh frames (what the detector task experiences)

Consistency check: e2e ~= h2d + dispatch + fetch + chip_step (the fused
step overlaps nothing at batch 1). The host-PCIe projection replaces 2-3
RTTs + tunnel bytes with PCIe terms (<0.2 ms) leaving
chip_step + host stages (HOST_BUDGET.json) as the projected p50.

Run:  cd /root/repo && timeout 900 python -u - < scripts/probe_transport.py
Appends one JSON line to TRANSPORT_PROBE.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

BUCKET = int(os.environ.get('PROBE_BUCKET', 1))
MODEL = os.environ.get('PROBE_MODEL', 'ssd_mobilenet_v2')
OUT = os.environ.get('PROBE_OUT', 'TRANSPORT_PROBE.jsonl')


def median(vals):
    s = sorted(vals)
    return s[len(s) // 2]


def main():
    import numpy as np
    import jax

    if os.environ.get('PROBE_PLATFORM') == 'cpu':   # smoke-test gate
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.getcwd(), '.jit_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.detection.backend import JaxDetectorBackend
    from watsor_tpu.timing import chained_step_ms, chained_model_runner

    dev = jax.devices()[0]
    print('device:', dev, file=sys.stderr, flush=True)

    os.environ['WATSOR_MIN_BUCKET'] = str(BUCKET)
    detector = build_from_zoo(MODEL)
    size = detector.config.input_size
    backend = JaxDetectorBackend(detector, device=dev, min_batch=BUCKET)

    row = {'experiment': 'transport_probe', 'model': MODEL,
           'bucket': BUCKET, 'input_size': size,
           'platform': dev.platform, 'host_cores': os.cpu_count()}

    # --- 2. tunnel RTT ---------------------------------------------------
    tiny = np.zeros((1,), np.float32)
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        x = jax.device_put(tiny, dev)
        float(x[0])
        rtts.append((time.perf_counter() - t0) * 1000.0)
    row['rtt_ms'] = {'median': round(median(rtts), 1),
                     'min': round(min(rtts), 1)}
    print('rtt', row['rtt_ms'], file=sys.stderr, flush=True)

    # --- 1. pure on-device step (chained, one compile) -------------------
    runner = chained_model_runner(detector.detect_batch, backend._params,
                                  BUCKET, size)
    n_long = 64 if BUCKET == 1 else 32
    chip_ms, detail = chained_step_ms(
        runner, n_short=4, n_long=n_long, reps=5,
        log=lambda m: print('chained:', m, file=sys.stderr, flush=True))
    row['chip_step_ms'] = round(chip_ms, 2)
    row['chip_step_detail'] = {k: detail[k] for k in
                               ('compile_s', 'times_short_s', 'times_long_s')}
    print('chip step ms', row['chip_step_ms'], file=sys.stderr, flush=True)

    # --- 3. H2D wall for one staged batch --------------------------------
    frames = np.random.RandomState(0).randint(
        0, 255, (BUCKET, size, size, 3), np.uint8)
    h2d_block, h2d_fetch = [], []
    for i in range(7):
        frames[0, 0, 0, 0] = i          # fresh bytes: defeat replay
        t0 = time.perf_counter()
        x = jax.device_put(frames, dev)
        x.block_until_ready()
        h2d_block.append((time.perf_counter() - t0) * 1000.0)
        int(x[0, 0, 0, 1])              # stricter: bytes provably landed
        h2d_fetch.append((time.perf_counter() - t0) * 1000.0)
    row['h2d_wall_ms'] = {'block_median': round(median(h2d_block), 1),
                          'block_min': round(min(h2d_block), 1),
                          'fetched_median': round(median(h2d_fetch), 1),
                          'payload_mb': round(frames.nbytes / 1e6, 2)}
    print('h2d', row['h2d_wall_ms'], file=sys.stderr, flush=True)

    # compile the serving fused step once before timing dispatch/fetch
    backend.warmup(batch=BUCKET)

    # --- 4. dispatch-only wall on resident inputs ------------------------
    fused = backend._fused_plain
    residents = []
    for i in range(2):
        frames[0, 0, 0, 0] = 100 + i
        residents.append(jax.device_put(frames, dev))
        residents[-1].block_until_ready()
    disp = []
    payloads = []
    for i in range(10):
        x = residents[i % 2]
        t0 = time.perf_counter()
        payloads.append(fused(backend._params, x))
        disp.append((time.perf_counter() - t0) * 1000.0)
    row['dispatch_wall_ms'] = {'median': round(median(disp), 2),
                               'min': round(min(disp), 2)}
    for p in payloads:
        p.block_until_ready()
    print('dispatch', row['dispatch_wall_ms'], file=sys.stderr, flush=True)

    # --- 5. fetch-only wall (step long finished) --------------------------
    fetches = []
    payload_bytes = None
    for i in range(5):
        frames[0, 0, 0, 0] = 200 + i
        x = jax.device_put(frames, dev)
        p = fused(backend._params, x)
        p.block_until_ready()
        time.sleep(1.0)                 # step certainly done
        t0 = time.perf_counter()
        arr = np.asarray(p)
        fetches.append((time.perf_counter() - t0) * 1000.0)
        payload_bytes = arr.nbytes
    row['fetch_wall_ms'] = {'median': round(median(fetches), 1),
                            'min': round(min(fetches), 1),
                            'payload_kb': round(payload_bytes / 1e3, 1)}
    print('fetch', row['fetch_wall_ms'], file=sys.stderr, flush=True)

    # --- 6. real backend e2e wall -----------------------------------------
    e2e = []
    for i in range(12):
        frames[0, 0, 0, 0] = i
        t0 = time.perf_counter()
        backend.resolve(backend.dispatch(frames.copy()))
        e2e.append((time.perf_counter() - t0) * 1000.0)
    e2e_sorted = sorted(e2e)
    row['e2e_wall_ms'] = {'median': round(median(e2e), 1),
                          'min': round(min(e2e), 1),
                          'p90': round(e2e_sorted[int(len(e2e) * 0.9)], 1)}
    print('e2e', row['e2e_wall_ms'], file=sys.stderr, flush=True)

    # --- decomposition + PCIe projection from measured parts -------------
    tunnel_ms = (row['h2d_wall_ms']['block_median']
                 + row['dispatch_wall_ms']['median']
                 + row['fetch_wall_ms']['median'])
    row['decomposition'] = {
        'transport_sum_ms': round(tunnel_ms, 1),
        'residual_vs_e2e_ms': round(
            row['e2e_wall_ms']['median'] - tunnel_ms, 1),
        'chip_step_ms': row['chip_step_ms'],
    }
    # PCIe gen3 x16 ~12 GB/s each way; RPC issue/fetch <0.05 ms on-host
    pcie_h2d = frames.nbytes / 12e9 * 1000.0
    pcie_d2h = (payload_bytes or 0) / 12e9 * 1000.0
    row['pcie_projection_ms'] = round(
        row['chip_step_ms'] + pcie_h2d + pcie_d2h + 0.1, 2)
    row['ts'] = time.strftime('%Y-%m-%dT%H:%M:%S')

    with open(OUT, 'a') as f:
        f.write(json.dumps(row) + '\n')
    print(json.dumps(row, indent=2), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
