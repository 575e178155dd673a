"""A/B the resolve transport: packed single-fetch vs per-field fetches
(round 4; backend.py _pack_outputs).

One process, one compiled detect program, the REAL JaxDetectorBackend with
device filter tables (the serving configuration). For each mode, measures
the full dispatch->resolve wall over REPS batches with a fresh input per
rep (byte poke defeats the rig's replay artifact), reporting mean/min.

Run on the chip:
    cd /root/repo && timeout 900 python -u scripts/probe_fetch.py
Env: PROBE_BATCH (default 8), PROBE_REPS (default 20).
"""

import json
import os
import sys
from time import perf_counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get('PROBE_BATCH', 8))
REPS = int(os.environ.get('PROBE_REPS', 20))


def measure(backend, frames, senders):
    walls = []
    for i in range(REPS):
        frames[0, 0, 0, 0] = i          # fresh bytes: defeat replay
        t0 = perf_counter()
        handle = backend.dispatch(frames, senders=senders)
        backend.resolve(handle)
        walls.append((perf_counter() - t0) * 1000.0)
    walls.sort()
    return {'mean_ms': round(sum(walls) / len(walls), 1),
            'min_ms': round(walls[0], 1),
            'p50_ms': round(walls[len(walls) // 2], 1)}


def main():
    import jax

    from watsor_tpu.detection.backend import JaxDetectorBackend
    from watsor_tpu.models.zoo import build_from_zoo
    from watsor_tpu.ops.filter_device import threshold_tables, zone_tables

    device = jax.devices()[0]
    print('device:', device, file=sys.stderr, flush=True)
    detector = build_from_zoo('ssd_mobilenet_v2',
                              active_labels=(1, 3))   # person+car serving
    detect = [{'person': {'confidence': 10, 'area': 1}},
              {'car': {'confidence': 10, 'area': 1}}]
    tables = {'cam0': threshold_tables(detect) + zone_tables(None, detect)}
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (BATCH, 300, 300, 3), np.uint8)
    senders = ['cam0'] * BATCH

    # three transports, ONE process, interleaved measurement blocks so
    # tunnel drift (measured: >10% between runs minutes apart) cancels:
    #   per_field      2 dispatches + 5-6 per-field fetches (original)
    #   packed         3 dispatches + 1 packed fetch
    #   packed_fused   1 fused dispatch + 1 packed fetch (serving default)
    backends = {}
    os.environ['WATSOR_PACKED_FETCH'] = '0'
    backends['per_field'] = JaxDetectorBackend(
        detector, device, max_batch=BATCH, camera_tables=tables)
    os.environ['WATSOR_PACKED_FETCH'] = '1'
    backends['packed'] = JaxDetectorBackend(
        detector, device, max_batch=BATCH, camera_tables=tables)
    backends['packed']._fused_plain = None      # force the 3-dispatch form
    backends['packed']._fused_filtered = None
    backends['packed_fused'] = JaxDetectorBackend(
        detector, device, max_batch=BATCH, camera_tables=tables)
    assert backends['packed_fused']._fused_filtered is not None

    results = {'batch': BATCH, 'reps': REPS,
               'platform': device.platform}
    for key, backend in backends.items():
        backend.warmup(batch=BATCH)
        print('warmed', key, file=sys.stderr, flush=True)
    all_walls = {k: [] for k in backends}
    for block in range(2):                      # interleave: A B C A B C
        for key, backend in backends.items():
            r = measure(backend, frames, senders)
            all_walls[key].append(r)
            print('block', block, key, r, file=sys.stderr, flush=True)
    for key, blocks in all_walls.items():
        results[key] = {'p50_ms': min(b['p50_ms'] for b in blocks),
                        'blocks': blocks}

    print(json.dumps(results), flush=True)
    with open('FETCH_PROBE.jsonl', 'a') as f:
        f.write(json.dumps(results) + '\n')


if __name__ == '__main__':
    main()
