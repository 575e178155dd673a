#!/bin/bash
# Round-4 TPU measurement sequence 2 (judge item #3): EfficientDet-Lite0-2
# per-section waterfalls, chained full-step cross-pins, and post-NMS-fix
# roofline re-pins for Lite1-3. Serialized, one process per model family,
# every run timeboxed (verify-skill tunnel rules).
cd /root/repo
set -x
for v in lite0 lite1 lite2; do
  echo "=== sections waterfall: $v ==="
  LITE_VARIANT=$v PROFILE_OUT=/root/repo/LITE_WATERFALL.jsonl \
    timeout 1500 python -u - backbone fpn heads \
    < scripts/profile_lite4_sections.py
  echo "=== $v sections done (exit $?) ==="
done

echo "=== chained cross-pin lite0-2 full steps ==="
VALIDATE_MODELS=efficientdet_lite0,efficientdet_lite1,efficientdet_lite2 \
  timeout 1800 python -u - < scripts/validate_timing.py
echo "=== chained done (exit $?) ==="

echo "=== roofline re-pin lite1 lite2 (post late-materialization NMS) ==="
timeout 1500 python -u scripts/roofline.py efficientdet_lite1 efficientdet_lite2
echo "=== roofline l1/l2 done (exit $?) ==="

echo "=== roofline re-pin lite3 ==="
timeout 1800 python -u scripts/roofline.py efficientdet_lite3
echo "=== roofline l3 done (exit $?) ==="
echo "=== sequence 2 complete ==="
