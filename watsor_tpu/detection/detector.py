"""The detection stage: a task that gathers frames from ALL cameras into one
batched device step.

Reference behavior being re-designed (not translated): the reference runs
one ``ObjectDetector`` *process* per accelerator, each pulling single frames
from a shared fairness-balanced queue and writing SSD detections into the
frame header in shared memory (/root/reference/watsor/detection/
detector.py:58-112). TPU-first, a detector is a *thread* that drains the
shared queue into a padded batch — the BalancedQueue's per-camera quota of 1
(/root/reference/watsor/stream/sync.py:144-166) then guarantees the batch
holds at most one frame per camera, i.e. the fairness property becomes the
batch-assembly rule. Detections are written back into the frame header
in place (no separate result channel) and the latch is confirmed per frame,
exactly as the reference's protocol requires.
"""

import logging
import threading

from queue import Empty
from typing import Dict

import numpy as np

from time import monotonic, time

from watsor_tpu.runtime.frames import DETECTION_DTYPE, MAX_DETECTIONS
from watsor_tpu.runtime.meters import FramesPerSecond, InferenceTime, \
    LatencyMeter
from watsor_tpu.runtime.tasks import Task


class ObjectDetector(Task):
    """Pulls payloads from the shared balanced queue, assembles a uint8
    staging batch at the model input resolution, runs the fused device step,
    and scatters results into the frame headers."""

    def __init__(self, name, frame_queue, frame_buffers: Dict[str, object],
                 backend, stop_event=None, max_batch=32,
                 batch_window_ms=4.0):
        self.frame_buffers = frame_buffers
        self.frame_queue = frame_queue
        self._backend = backend
        self._max_batch = max_batch
        # after the first frame arrives, keep gathering for up to this long
        # so concurrent cameras land in ONE device step (bounded latency
        # cost, large MXU utilization win — SURVEY.md §7 hard-part 2)
        self._batch_window = batch_window_ms / 1000.0
        h, w = backend.input_hw
        # two staging buffers, ping-ponged per dispatch: batch N+1 stages
        # (and starts its H2D) while batch N computes — the async-pipeline
        # design the reference gets from CUDA streams
        # (/root/reference/watsor/detection/tensorrt_gpu.py:145-160)
        self._staging = np.zeros((2, max_batch, h, w, 3), np.uint8)
        self._staging_sel = 0
        self._inflight = None  # (backend handle, frames of the batch)
        self.fps = FramesPerSecond()
        self.inference_time = InferenceTime()
        # north-star metric: frame capture -> detections-in-header
        self.latency = LatencyMeter()
        # set once warmup compiled the serving program: the application
        # gates camera ingest on it (the reference holds ffmpeg under
        # SIGSTOP until the workers are up, stream/ffmpeg.py:43-44 —
        # frames decoded into a cold detector only age past the stale
        # limit and are thrown away)
        self.ready = threading.Event()
        super().__init__(name, stop_event)

    @property
    def device_name(self):
        return self._backend.device_name

    def _on_start(self):
        # compile before the first real frame arrives (the reference builds
        # its TRT engine offline for the same reason, main_for_gpu.py:17-26).
        # Warm the bucket the live batches will actually hit: with N
        # cameras the first real batch pads to bucket(N), and compiling it
        # in-line would stall past the 30 s stale-frame reclaim.
        try:
            self._backend.warmup(batch=min(max(len(self.frame_buffers), 1),
                                           self._max_batch))
        except Exception:
            self._logger.exception('Detector warmup failed')
        finally:
            self.ready.set()

    def _process(self):
        try:
            # with a step in flight, poll briefly so its results scatter
            # promptly even when no new frames arrive
            payload = self.frame_queue.get(
                timeout=0.002 if self._inflight is not None else 1)
        except Empty:
            self._finish_inflight()
            return
        payloads = [payload]
        deadline = monotonic() + self._batch_window
        while len(payloads) < self._max_batch:
            try:
                payloads.append(self.frame_queue.get_nowait())
            except Empty:
                remaining = deadline - monotonic()
                if remaining <= 0:
                    break
                try:
                    payloads.append(self.frame_queue.get(timeout=remaining))
                except Empty:
                    break
        self._detect(payloads)

    def _stage(self, staging, index, frame):
        """Copy one frame into the staging batch, resizing on the host only
        when the decode resolution differs from the detect resolution (the
        decoder normally emits a detect-resolution plane, making this a
        straight memcpy)."""
        h, w = self._backend.input_hw
        detect_plane = getattr(frame, 'detect_plane', None)
        if detect_plane is not None and detect_plane.shape[:2] == (h, w):
            staging[index] = detect_plane
        elif frame.image.shape[:2] == (h, w):
            staging[index] = frame.image
        else:
            import cv2
            cv2.resize(frame.image, (w, h), dst=staging[index],
                       interpolation=cv2.INTER_LINEAR)

    def _detect(self, payloads):
        frames = []
        senders = []
        staging = self._staging[self._staging_sel]
        for p in payloads:
            frame = self.frame_buffers[p.sender].frames[p.frame_index]
            self._stage(staging, len(frames), frame)
            frames.append(frame)
            senders.append(p.sender)

        # epoch snapshot: if a frame is force-reclaimed (30 s stale rule)
        # while this batch is in flight, its epoch changes — the late
        # confirmation must then be dropped, not advance the new owner's
        # latch
        epochs = [frame.epoch for frame in frames]

        dispatch = getattr(self._backend, 'dispatch', None)
        if dispatch is None:
            # synchronous protocol (test doubles): no pipelining
            try:
                result = self._backend.detect_batch(staging[:len(frames)],
                                                    senders=senders)
            except Exception:
                self._logger.exception('Detection step failed')
                for frame in frames:
                    frame.latch.next()
                return
            self._scatter(result, frames, epochs)
            return

        try:
            handle = dispatch(staging[:len(frames)], senders=senders)
        except Exception:
            self._logger.exception('Detection dispatch failed')
            for frame in frames:
                frame.latch.next()
            return
        # the previous step computed while this batch staged + transferred
        self._staging_sel ^= 1
        self._finish_inflight()
        self._inflight = (handle, frames, epochs)

    def _finish_inflight(self):
        if self._inflight is None:
            return
        handle, frames, epochs = self._inflight
        self._inflight = None
        try:
            result = self._backend.resolve(handle)
        except Exception:
            self._logger.exception('Detection step failed')
            for frame, epoch in zip(frames, epochs):
                if frame.epoch == epoch:
                    frame.latch.next()
            return
        self._scatter(result, frames, epochs)

    def _on_stop(self):
        # never strand a dispatched batch: its frames hold latch confirms
        self._finish_inflight()

    def _scatter(self, result, frames, epochs=None):
        boxes, scores, classes, valid, device_ms = result[:5]
        zones_hit = result[5] if len(result) > 5 else None

        per_frame_ms = device_ms / len(frames)
        now = time()
        for i, frame in enumerate(frames):
            if epochs is not None and frame.epoch != epochs[i]:
                # the slot was force-reclaimed and re-owned while this
                # batch was in flight; confirming would corrupt the new
                # owner's latch cycle
                self._logger.warning(
                    'Dropping late detections for a reclaimed frame slot')
                continue
            if frame.epoch > 0:
                self.latency((now - frame.epoch) * 1000.0)
            if zones_hit is None:
                n = min(int(valid[i]), MAX_DETECTIONS)
                rows = np.arange(n)
            else:
                # device-filtered: kept rows are flagged, not compacted
                rows = np.nonzero(scores[i] > 0.0)[0][:MAX_DETECTIONS]
                n = len(rows)
            records = np.zeros(n, DETECTION_DTYPE)
            if n:
                fh, fw = frame.image.shape[:2]
                px = boxes[i, rows] * np.array([fh, fw, fh, fw], np.float32)
                records['label'] = classes[i, rows]
                records['confidence'] = scores[i, rows]
                records['bbox'] = px
                if zones_hit is not None:
                    # vectorized zone scatter: stable-sort hit columns first
                    # (ascending zone index), mask the tail — no Python loop
                    # per detection (this runs 32x30 times a second)
                    hits = zones_hit[i, rows]                  # [n, Z] bool
                    width = min(10, hits.shape[1])
                    order = np.argsort(~hits, axis=1,
                                       kind='stable')[:, :width]
                    mask = np.take_along_axis(hits, order, axis=1)
                    records['zones'][:, :width] = np.where(
                        mask, order + 1, 0)
                    records['num_zones'] = mask.sum(axis=1)
            frame.set_detections(records)
            frame.latch.next()
            self.fps(True)
            self.inference_time(per_frame_ms)


def resolve_device_pool(pool_spec=None):
    """Enumerate the accelerator pool detectors are created over.

    The reference enumerates EVERY device class simultaneously — EdgeTPUs,
    CUDA GPUs and the CPU fallback all get a detector process draining the
    same balanced queue (/root/reference/watsor/detection/detector.py:40-52).
    The TPU-native default is all TPU chips, else one CPU device; the
    ``WATSOR_DEVICE_POOL`` env (or ``pool_spec``) opts into heterogeneous
    mixes with a comma list of ``platform[:count]`` entries, e.g.
    ``tpu,cpu:1`` (every chip plus one CPU detector) or ``cpu:2``.
    """
    import os

    import jax

    try:
        all_devices = jax.devices()
    except RuntimeError as exc:
        # the accelerator RUNTIME failed to initialize (e.g. an
        # unavailable TPU tunnel) — serve on CPU rather than die, the
        # reference's CPU-fallback contract (detector.py:48-50). The
        # hang case is covered earlier by discovery.ensure_responsive_
        # backend (init holds a global lock, so it cannot be caught here)
        logging.getLogger(__name__).warning(
            'Accelerator backend failed to initialize (%s) — '
            'falling back to CPU', exc)
        jax.config.update('jax_platforms', 'cpu')
        all_devices = jax.devices()

    spec = pool_spec if pool_spec is not None \
        else os.environ.get('WATSOR_DEVICE_POOL', '')
    devices = []
    if spec.strip():
        log = logging.getLogger(__name__)
        for entry in spec.split(','):
            entry = entry.strip()
            if not entry:
                continue
            platform, _, count = entry.partition(':')
            platform = platform.strip().lower()
            try:
                pool = jax.devices(platform)
            except RuntimeError:
                log.warning('WATSOR_DEVICE_POOL: no %r devices visible — '
                            'skipping the entry', platform)
                continue
            if count.strip():
                try:
                    limit = int(count)
                except ValueError:
                    log.warning('WATSOR_DEVICE_POOL: bad count %r in %r — '
                                'skipping the entry', count.strip(), entry)
                    continue
                if limit <= 0:
                    log.warning('WATSOR_DEVICE_POOL: non-positive count in '
                                '%r — skipping the entry', entry)
                    continue
                pool = pool[:limit]
            devices.extend(d for d in pool if d not in devices)
    if not devices:
        devices = [d for d in all_devices if d.platform == 'tpu']
    if not devices:
        devices = jax.devices('cpu')[:1]
    return devices


def create_object_detectors(frame_queue_group, frame_buffers, backend_factory,
                            stop_event=None, max_batch=64, pool_spec=None):
    """One detector task per device in the pool, all draining the same
    balanced queue — the load-balancing contract of the reference's factory
    (/root/reference/watsor/detection/detector.py:12-55: one process per
    EdgeTPU/GPU, CPU fallback, assert at least one device; heterogeneous
    pools via :func:`resolve_device_pool`).

    ``backend_factory(device) -> DetectorBackend``.
    """
    devices = resolve_device_pool(pool_spec)
    assert len(devices) > 0, "No devices available for detection"

    any_queue = next(iter(frame_queue_group.values()))
    # the gather window only pays off when several cameras can land in one
    # batch; a single camera should never wait
    window_ms = 4.0 if len(frame_buffers) > 1 else 0.0
    detectors = []
    for i, device in enumerate(devices):
        backend = backend_factory(device)
        detectors.append(ObjectDetector(
            'detector{}'.format(i + 1), any_queue, frame_buffers, backend,
            stop_event=stop_event, max_batch=max_batch,
            batch_window_ms=window_ms))
    return detectors
