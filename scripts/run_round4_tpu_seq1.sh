#!/bin/bash
# Round-4 TPU measurement sequence 1 (serialized: one chip, one process
# at a time, one compile per process — CLAUDE.md / verify-skill rules).
cd /root/repo
set -x
echo "=== transport probe bucket 1 ==="
timeout 1500 python -u - < scripts/probe_transport.py
echo "=== probe done (exit $?) ==="

echo "=== sweep leg: cams=16 cap=1.0 (low-load tail of the curve) ==="
SWEEP_CAMERAS=16 SWEEP_CAP=1.0 SWEEP_WARM_DEADLINE=1200 \
  timeout 1800 python -u scripts/latency_sweep.py
echo "=== leg done (exit $?) ==="

echo "=== sweep leg: efficientdet_lite0 cams=1 cap=3 ==="
SWEEP_CAMERAS=1 SWEEP_CAP=3.0 SWEEP_MODEL=efficientdet_lite0 \
  SWEEP_WARM_DEADLINE=1200 timeout 1800 python -u scripts/latency_sweep.py
echo "=== leg done (exit $?) ==="
echo "=== sequence 1 complete ==="
