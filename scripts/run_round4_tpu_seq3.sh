#!/bin/bash
# Round-4 TPU sequence 3 (judge item #8): the Lite3/Lite4 f32 golden legs —
# the last two un-run accuracy legs. These programs compile >40 min over
# the tunnel and once wedged the axon server (ROADMAP "Tunnel stability"),
# so each leg is its own process with a hard timebox; a timeout is
# RECORDED as a dated waiver row rather than retried.
cd /root/repo
set -x
for fam in efficientdet_lite3 efficientdet_lite4; do
  echo "=== f32 golden leg: $fam (timebox 3300s) ==="
  GOLDEN_LEGS=f32 timeout 3300 python -u - "$fam" < scripts/golden_on_tpu.py
  rc=$?
  echo "=== $fam f32 leg done (exit $rc) ==="
  if [ $rc -ne 0 ]; then
    echo "{\"family\": \"$fam\", \"leg\": \"f32\", \"status\": \"attempted-$(date -u +%Y-%m-%dT%H:%M:%S)Z\", \"exit\": $rc, \"note\": \"timeboxed 3300s over the axon tunnel (compile >40min wedges the rig - ROADMAP tunnel-stability)\"}" >> GOLDEN_TPU.jsonl
  fi
done
echo "=== sequence 3 complete ==="
