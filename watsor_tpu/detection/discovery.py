"""Accelerator responsiveness probe — startup failure detection.

The reference's detector factory falls back to CPU when no accelerator
is present (/root/reference/watsor/detection/detector.py:48-50). A
TPU-native deployment adds a failure mode the reference never sees: the
accelerator RUNTIME itself can hang or error at initialization
(observed live in round 3: a wedged TPU tunnel server blocked
``jax.devices()`` indefinitely — and JAX backend init holds a
process-global lock, so once the main thread touches it no in-process
fallback can ever engage, and the service never comes up while its
liveness probe keeps restarting it).

This module probes backend initialization in a SUBPROCESS with a
deadline BEFORE the parent process touches JAX. On hang or failure it
pins ``jax_platforms='cpu'`` in the parent — the same last-resort
serving posture the reference's CPU fallback provides — and the
Application boots degraded-but-alive instead of hanging forever.

Knobs: ``WATSOR_DEVICE_PROBE_TIMEOUT`` (seconds, default 180; 0
disables the probe), ``WATSOR_PLATFORM`` (an explicit choice skips the
probe entirely).
"""

import os
import subprocess
import sys

PROBE_TIMEOUT_ENV = 'WATSOR_DEVICE_PROBE_TIMEOUT'
DEFAULT_PROBE_TIMEOUT = 180.0          # the one documented default
_PROBE_SRC = 'import jax; print(jax.devices()[0].platform)'


def _run_probe(cmd, timeout_s):
    """(ok, detail) for one subprocess probe run.

    Output goes to a temp file, not pipes, and timeout kills the whole
    process GROUP: a hung accelerator runtime can spawn helpers that
    survive the child and hold a pipe open, which blocks the
    pipe-draining wait of ``subprocess.run(capture_output=True)``
    forever (observed live on the wedged-tunnel rig)."""
    import signal
    import tempfile

    try:
        with tempfile.TemporaryFile() as out:
            proc = subprocess.Popen(cmd, stdout=out,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except OSError:
                    proc.kill()
                proc.wait()
                return False, ('probe timed out after %.0fs (backend hang)'
                               % timeout_s)
            out.seek(0)
            text = out.read().decode('utf-8', errors='replace').strip()
    except OSError as exc:
        return False, 'probe could not run: %s' % exc
    tail = text.splitlines()[-1] if text else ''
    if rc != 0:
        return False, tail or 'exit %d' % rc
    return True, tail


def ensure_responsive_backend(logger=None, timeout_s=None, _cmd=None,
                              _platforms=None):
    """Probe accelerator init with a deadline; pin CPU on hang/failure.

    Must run before the first JAX backend use in this process. Returns
    ``'cpu'`` when the fallback was applied, else ``None``. ``_cmd`` /
    ``_platforms`` exist for tests (inject a fake probe command /
    platform string).
    """
    if os.environ.get('WATSOR_PLATFORM'):
        return None                        # explicit operator choice wins
    if timeout_s is None:
        timeout_s = float(os.environ.get(PROBE_TIMEOUT_ENV,
                                         DEFAULT_PROBE_TIMEOUT))
    if timeout_s <= 0:
        return None
    import jax
    platforms = _platforms if _platforms is not None \
        else (jax.config.jax_platforms or '')
    if platforms == 'cpu':
        # already pinned to the safe backend (test processes run so)
        return None
    # '' = auto-select — exactly the state a production container boots
    # in, and a wedged accelerator runtime hangs auto-select the same way
    # it hangs an explicit choice (JAX's own fallback covers init ERRORS,
    # not hangs), so probe it too; a plain-CPU host answers the probe in
    # a couple of seconds
    ok, detail = _run_probe(
        _cmd or [sys.executable, '-c', _PROBE_SRC], timeout_s)
    if ok:
        return None
    if logger is not None:
        logger.warning(
            'Accelerator backend (%s) failed to initialize within %.0fs '
            '(%s) — serving on CPU, the reference CPU-fallback contract. '
            'Restart the service once the accelerator runtime recovers.',
            platforms, timeout_s, detail)
    jax.config.update('jax_platforms', 'cpu')
    return 'cpu'
