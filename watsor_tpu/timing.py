"""Tamper-proof device timing for benchmark credibility.

Round-3 discovery (BENCHMARKS.md "Timing methodology"): on the axon
tunnel rig two effects can poison the usual time-N-dispatches pattern:

1. **Early readiness** — ``jax.block_until_ready`` can return before the
   device has executed a dispatched program; a later value fetch then
   stalls.  Timing loops that only synchronize on readiness may under-
   report (the work happens after the clock stops) or over-report (a
   previous program's work lands inside the timed window).
2. **Identical-dispatch replay** — repeating the SAME (program, input)
   dispatch can return in ~0.2 ms while a fresh input takes the full
   step time, i.e. results are replayed rather than re-executed.
   ``min()`` over same-input repetitions then measures the replay.

This helper defeats both: the program is a data-chained
``lax.fori_loop`` inside ONE jit — iteration i+1's input carries a
value derived from iteration i's output, forcing sequential execution —
whose input is generated ON DEVICE from a fresh host seed every timed
call (no dispatch is ever identical) and whose output is a scalar the
host actually fetches (a value cannot be faked by readiness).
Differencing two loop lengths cancels the RTT/dispatch/input-generation
constant, leaving pure per-step device time.

The reference has no benchmark suite (BASELINE.md); this module is part
of the rebuild's extension of that surface and backs the numbers in
BENCHMARKS.md and TIMING_VALIDATION.jsonl.
"""

from time import perf_counter


def chained_step_ms(run, n_short=2, n_long=32, reps=5,
                    seed_base=1000, log=None):
    """Measure per-step device time of a chained loop program.

    ``run(seed, n) -> scalar`` must be a jit-compiled function that
    (a) generates its input on device from ``seed``, (b) runs ``n``
    (a *dynamic* loop bound, so one compile serves every n)
    data-chained iterations of the step under test in a
    ``lax.fori_loop``, and (c) returns a scalar derived from the loop
    carry.  The caller is responsible for the data chain (iteration
    i+1 must consume a value produced by iteration i).

    Returns ``(ms_per_step, detail)`` where detail carries the raw
    short/long wall times and the compile time for the record.
    The reported value is ``(min(long) - min(short)) / (n_long -
    n_short)``: min over reps bounds tunnel RTT jitter from above, and
    the long loop amortizes what remains.
    """
    detail = {'n_short': n_short, 'n_long': n_long, 'reps': reps}

    t0 = perf_counter()
    float(run(seed_base, n_short))      # compile + first execution
    detail['compile_s'] = round(perf_counter() - t0, 1)
    if log:
        log('compiled in %.0fs' % detail['compile_s'])

    def timed(n, tag):
        times = []
        for r in range(reps):
            seed = seed_base + 1 + n * 1000 + r   # never reused
            t0 = perf_counter()
            float(run(seed, n))         # scalar fetch forces completion
            times.append(perf_counter() - t0)
        detail['times_%s_s' % tag] = [round(t, 4) for t in times]
        if log:
            log('chained n=%d: %s' % (n, detail['times_%s_s' % tag]))
        return min(times)

    t_short = timed(n_short, 'short')
    t_long = timed(n_long, 'long')
    ms = (t_long - t_short) * 1000.0 / (n_long - n_short)
    return ms, detail


def chained_full_path_runner(detect_batch, params, tables, row_idx,
                             batch, hw):
    """``run(seed, n)`` for the COMPLETE production device path — every
    device stage the serving pipeline chains per tick, in ONE program:

      1080p-ingest detect (device resize + normalize + forward + box
      decode + NMS) -> per-camera filter cascade selected by ``row_idx``
      (confidence/area/zone-SAT, ops/filter_device.py) -> packed
      single-fetch transport build (detection/backend pack_zones) ->
      batched box-overlay render (ops/overlay.render_boxes).

    The loop carry forces sequential execution (iteration i+1's input
    adds a value derived from i's outputs) and the accumulator reduces
    BOTH the packed transport and the rendered pixels, so no stage can
    be dead-code-eliminated. The rendered-frame reduction re-reads one
    uint8 frame batch per step (~0.2 ms of HBM at 1080p x 32) — a small,
    conservative overstatement of the true step time.

    The carry is (dep_scalar, acc), NOT the frame batch: carrying a
    [B, 1080, 1920, 3] uint8 through fori_loop makes XLA materialize
    layout-conversion copies of it in the channels-minor tiled layout
    (3 lanes padded to 128 -> 42.7x expansion, 7.9 GB each — OOM on a
    16 GB chip). ``img0 + dep`` instead rebuilds the input inside the
    body as an elementwise op that fuses into the consumers, so the
    padded form is never allocated.

    ``tables``: the stacked per-camera (conf, area, zone_sat, zone_allow)
    device arrays (backend._FilterTableStore layout); ``row_idx``: [batch]
    int32 camera rows.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from watsor_tpu.config.coco import COCO_COLOR_TABLE
    from watsor_tpu.detection.backend import _get_packers
    from watsor_tpu.ops.filter_device import apply_filters_device_indexed
    from watsor_tpu.ops.overlay import render_boxes

    h, w = (hw, hw) if isinstance(hw, int) else hw
    _, pack_zones = _get_packers()
    color_table = jnp.asarray(np.asarray(COCO_COLOR_TABLE, np.uint8))
    scale = jnp.asarray([h, w, h, w], jnp.float32)
    row_idx = jnp.asarray(row_idx, jnp.int32)

    @jax.jit
    def run(seed, n):
        key = jax.random.PRNGKey(seed)
        img0 = jax.random.randint(key, (batch, h, w, 3), 0, 255,
                                  dtype=jnp.uint8)

        def body(i, carry):
            dep, acc = carry
            img = img0 + dep            # fuses into consumers (no copy)
            out = detect_batch(params, img)
            scores, classes, zones_hit, valid = \
                apply_filters_device_indexed(
                    out.boxes, out.scores, out.classes, *tables, row_idx)
            packed = pack_zones(out.boxes, scores, classes, valid,
                                zones_hit)
            rendered = render_boxes(img, out.boxes * scale, classes,
                                    color_table)
            # full reductions: a single-element probe could let XLA
            # slice through the einsums and skip the render
            render_sum = jnp.sum(rendered, dtype=jnp.int32)
            dep = (render_sum % 2).astype(jnp.uint8) + \
                (jnp.sum(packed) * 0).astype(jnp.uint8)
            return dep, acc + jnp.sum(packed) + \
                render_sum.astype(jnp.float32)

        _, acc = lax.fori_loop(0, n, body,
                               (jnp.uint8(0), jnp.float32(0)))
        return acc

    return run


def measure_production_device_path(batch=32, hw=(1080, 1920),
                                   n_short=2, n_long=32, reps=5,
                                   n_cameras=32, log=None):
    """Build the north-star serving program (SSD-MobileNet-v2, fused_exact
    NMS, active labels {person, car}, zones configured) and time the FULL
    device path with the tamper-proof chained harness. Returns a record
    dict (BENCHMARKS.md "Full device path"; north star = 32 cams x 30 fps
    = 960 fps, BASELINE.json config 5 / reference README.md:455)."""
    import jax
    import numpy as np

    from watsor_tpu.models.ssd import SSDConfig, build_detector
    from watsor_tpu.ops.filter_device import threshold_tables, zone_tables
    from watsor_tpu.filters.mask import ZoneMask

    det = build_detector(SSDConfig(nms_mode='fused_exact',
                                   active_labels=(1, 3)))
    device = jax.devices()[0]
    params = jax.device_put(det.params, device)

    h, w = hw
    # a real two-zone mask + the demo detect config -> genuine SAT tables
    alpha = np.zeros((h, w), np.uint8)
    alpha[h // 8: h // 2, w // 8: w // 2] = 255
    alpha[h // 2 + 40: h - 40, w // 2 + 40: w - 40] = 255
    zone_mask = ZoneMask(alpha, (h, w))
    cfg = [{'person': {'confidence': 60, 'area': 10, 'zones': [1, 2]}},
           {'car': {'confidence': 60, 'area': 10, 'zones': []}}]
    conf, area = threshold_tables(cfg)
    zsat, zallow = zone_tables(zone_mask, cfg)
    tables = tuple(jax.device_put(
        np.stack([t] * n_cameras), device)
        for t in (conf, area, zsat, zallow))
    row_idx = np.arange(batch, dtype=np.int32) % n_cameras

    run = chained_full_path_runner(det.detect_batch, params, tables,
                                   row_idx, batch, hw)
    ms, detail = chained_step_ms(run, n_short=n_short, n_long=n_long,
                                 reps=reps, log=log)
    fps = batch * 1000.0 / ms
    return {
        'metric': 'full device path (1080p detect + per-camera filters + '
                  'zone SATs + pack + overlay render), chained, batch %d'
                  % batch,
        'model': 'ssd_mobilenet_v2 fused_exact C=2',
        'batch': batch, 'ingest': '%dx%d' % (w, h),
        'ms_per_step': round(ms, 3),
        'fps': round(fps, 1),
        'north_star_fps': 960.0,
        'vs_north_star': round(fps / 960.0, 2),
        'device': str(device),
        'detail': detail,
    }


def chained_model_runner(step, params, batch, size):
    """Standard ``run(seed, n)`` for a detector ``detect_batch`` step:
    uint8 [batch, H, W, 3] input from the seed (``size`` is an int for
    square inputs or an (H, W) tuple), chain via a zero scalar derived
    from each step's scores, dynamic loop bound."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h, w = (size, size) if isinstance(size, int) else size

    @jax.jit
    def run(seed, n):
        key = jax.random.PRNGKey(seed)
        img0 = jax.random.randint(key, (batch, h, w, 3), 0, 255,
                                  dtype=jnp.uint8)

        def body(i, carry):
            img, acc = carry
            out = step(params, img)
            scores = out[1]
            dep = (scores[0, 0] * 0).astype(jnp.uint8)
            return img0 + dep, acc + scores[0, 0].astype(jnp.float32)

        _, acc = lax.fori_loop(0, n, body, (img0, jnp.float32(0)))
        return acc

    return run
