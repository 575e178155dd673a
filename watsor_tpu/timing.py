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
