"""Candidate-union top-k strategies at EfficientDet-Lite4 scale.

The fused NMS selects the class-agnostic top-M=128 anchors of A=76,725 by
best score (`ops/nms.py:105-108`). `lax.top_k` on a [32, 76725] row
lowers to a full key-value sort on TPU — O(log^2 A) HBM passes — and the
decode+NMS section of the Lite4 step measures 210 MB/frame at 49.6% BW
(LITE4_PROFILE.jsonl), pointing at the sort. Candidates raced here, all
on device-resident inputs:

  a. top_k          — the baseline single-pass-API full sort;
  b. two_stage      — EXACT: per-chunk top-k over [B, A/c, c] (any global
                      top-k element is in its chunk's top-k), then top-k
                      of the [B, (A/c)*k] survivors, indices re-derived
                      through the chunk offsets. Same (value, lowest
                      index) tie order as top_k.
  c. approx_max_k   — TPU PartialReduce (Chern et al. 2022), recall
                      target 0.99: NOT exact, measured for the bound.

Prints ms per variant and whether results match the baseline bit-exactly.

    cd /root/repo && timeout 3000 python -u - < scripts/measure_topk.py
"""

import json
import sys
from functools import partial
from time import perf_counter

import numpy as np

REPO = '/root/repo'
if REPO not in sys.path:
    sys.path.insert(0, REPO)

B, A, M = 32, 76725, 128
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    # scores in [0, 1) like post-sigmoid best-class scores
    rows = [jax.device_put(rng.rand(B, A).astype(np.float32), device)
            for _ in range(2)]

    @jax.jit
    def baseline(s):
        return jax.lax.top_k(s, M)

    @partial(jax.jit, static_argnames=('chunk',))
    def two_stage(s, chunk=1024):
        b, a = s.shape
        pad = (-a) % chunk
        s_p = jnp.pad(s, ((0, 0), (0, pad)),
                      constant_values=-jnp.inf)
        g = s_p.shape[1] // chunk
        v1, i1 = jax.lax.top_k(s_p.reshape(b, g, chunk), M)   # [B, g, M]
        base = (jnp.arange(g) * chunk)[None, :, None]
        flat_idx = (i1 + base).reshape(b, g * M)
        v2, i2 = jax.lax.top_k(v1.reshape(b, g * M), M)
        idx = jnp.take_along_axis(flat_idx, i2, axis=1)
        return v2, idx

    @jax.jit
    def approx(s):
        return jax.lax.approx_max_k(s, M, recall_target=0.99)

    results = {}
    legs = [('top_k', baseline), ('two_stage_c1024', two_stage),
            ('two_stage_c4096', lambda s: two_stage(s, chunk=4096)),
            ('approx_0.99', approx)]
    ref_v = ref_i = None
    for name, fn in legs:
        try:
            out = jax.block_until_ready(fn(rows[0]))
        except Exception as e:
            results[name] = {'error': str(e)[:200]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        t = perf_counter()
        outs = [fn(rows[i % 2]) for i in range(STEPS)]
        jax.block_until_ready(outs[-1])
        ms = (perf_counter() - t) / STEPS * 1000.0
        v, i = [np.asarray(x) for x in out]
        if ref_v is None:
            ref_v, ref_i = v, i
            exact = True
        else:
            exact = bool(np.array_equal(v, ref_v) and
                         np.array_equal(i, ref_i))
        results[name] = {'ms': round(ms, 3), 'exact': exact}
        print(json.dumps({name: results[name]}), flush=True)
    with open('/tmp/topk_results.json', 'w') as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
