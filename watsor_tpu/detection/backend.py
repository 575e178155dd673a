"""Detector backends: the uniform protocol the pipeline drives.

The reference defines a duck-typed backend protocol —
``__init__(model_path, [device])``, ``device_name``, context manager,
``detect(shape, image, detections) -> ms`` — with one implementation per
runtime (/root/reference/watsor/detection/{edge_tpu,tensorrt_gpu,
tensorflow_cpu,tensorflow_lite_cpu}.py). Here a backend consumes a whole
BATCH of frames in one call (the TPU-native unit of work) and all four
reference runtimes collapse into one JAX backend parameterized by the
placement device: TPU chips replace EdgeTPU/GPU, the JAX CPU backend
replaces TensorFlow/TFLite-CPU. Device *selection* maps to ``jax.devices()``
instead of CORAL_VISIBLE_DEVICES/CUDA_VISIBLE_DEVICES env plumbing
(/root/reference/watsor/detection/devices.py).
"""

import logging
import threading
from time import perf_counter
from typing import Optional, Tuple

import numpy as np

from watsor_tpu.runtime.frames import MAX_ZONES

_BUCKETS = (1, 2, 4, 8, 16, 32, 64)

# the packed transport encodes zone hits as a sum of 2**k weights in f32,
# exact only while k < 24 (f32 mantissa) — guard the ceiling where the
# bitmask is built (pack_zones) and where its width is configured
assert MAX_ZONES <= 24, 'packed zone bitmask is f32-exact only up to 24 bits'


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 31) // 32) * 32


def _min_bucket_env() -> int:
    """Parse WATSOR_MIN_BUCKET with the same warn-and-fall-back posture as
    resolve_device_pool: a malformed value ('auto', '1.5') must not crash
    detector startup."""
    import os

    raw = os.environ.get('WATSOR_MIN_BUCKET', '') or ''
    if not raw.strip():
        return 1
    try:
        return int(raw)
    except ValueError:
        logging.getLogger('watsor_tpu.detector').warning(
            'Ignoring malformed WATSOR_MIN_BUCKET=%r (want an integer); '
            'using 1', raw)
        return 1


class _FilterTableStore:
    """Per-camera filter tables resident on device, selected per batch by
    a tiny index gather.

    The tables are constant per camera, and the zone SATs are the bulk
    (32 cameras x 10 zones x 97x97 f32 ≈ 12 MB) — re-shipping them every
    batch would dominate H2D, and caching stacked batches by sender
    ordering is hopeless (batch assembly drains a shared queue, so the
    ordering is nondeterministic). Instead every camera's tables are
    device_put ONCE as [num_cameras, ...] arrays; a dispatch ships only
    the [b] int32 row-index vector and the gather happens on device
    inside the jitted filter step. O(#cameras) HBM, zero steady-state
    table H2D."""

    def __init__(self, camera_tables, device=None):
        import jax
        names = sorted(camera_tables)
        self.names = names
        self._row = {name: i for i, name in enumerate(names)}
        stacked = tuple(
            np.stack([np.asarray(camera_tables[name][i]) for name in names])
            for i in range(4))
        self.tables = tuple(jax.device_put(t, device) for t in stacked)

    def rows(self, senders, b):
        """[b] int32 row indices (padding rows reuse row 0)."""
        idx = np.zeros(b, np.int32)
        for i, sender in enumerate(senders[:b]):
            idx[i] = self._row[sender]
        return idx


def _apply_device_filters(out, store, row_idx):
    from watsor_tpu.ops.filter_device import apply_filters_device_indexed
    scores_f, classes_f, zones_hit, valid_f = apply_filters_device_indexed(
        out.boxes, out.scores, out.classes, *store.tables, row_idx)
    return out._replace(scores=scores_f, classes=classes_f,
                        valid=valid_f), zones_hit


def _refine_zones(zone_refiners, senders, boxes, scores, classes, valid,
                  zones_hit):
    """Exact full-res host zone pass over the device-filtered survivors
    (ops/filter_device.ZoneRefiner); the device test over-approximates so
    this only ever REMOVES boundary-band false keeps. Mutates the sliced
    result arrays in place."""
    for i, sender in enumerate(senders[:len(boxes)]):
        refiner = zone_refiners.get(sender)
        if refiner is None:
            continue                       # no mask: zones disabled
        rows = np.nonzero(scores[i] > 0.0)[0]
        if not len(rows):
            continue
        keep, hit = refiner(boxes[i, rows], classes[i, rows])
        zones_hit[i, rows] = hit[:, :zones_hit.shape[2]]
        drop = rows[~keep]
        if len(drop):
            scores[i, drop] = 0.0
            classes[i, drop] = 0
            zones_hit[i, drop] = False
            valid[i] -= len(drop)


def auto_min_bucket(platform, n_cameras):
    """Deployment default for the floor bucket (WATSOR_MIN_BUCKET).

    On TPU the padded rows of a floored bucket are nearly free (a few
    hundred KB of H2D; the program shape does identical device work), so
    an N-camera deployment should pin ONE compiled shape — bucket(N) —
    instead of inline-compiling each smaller bucket the first time a
    partial batch hits it (minutes on a cold cache, mid-serving, after
    `ready` was signalled). On CPU the padded rows cost REAL per-row
    convolution time (~400 ms/frame for SSD300 on one core), so a CPU
    detector — including the CPU member of a heterogeneous
    WATSOR_DEVICE_POOL — keeps the unfloored buckets and accepts the
    one-off inline compile instead.

    Returns the ``min_batch`` to pass to a backend, or None to let the
    backend's own env-var default apply (also when the operator set
    WATSOR_MIN_BUCKET explicitly — the env always wins).
    """
    import os

    if os.environ.get('WATSOR_MIN_BUCKET'):
        return None
    if platform == 'tpu':
        return max(int(n_cameras), 1)
    return None


def _make_packers():
    """Jitted single-buffer output packing.

    resolve() used to fetch 4-6 separate device arrays; every fetch is a
    host-device round trip (on a PCIe host a sync each, on this rig a
    measured ~27 ms tunnel RTT each — the latency sweep found 5 fetches
    costing ~135 ms of a 204 ms small-batch step). The step's outputs are
    instead packed ON DEVICE into one f32 [B, N+1, 7] array — cols 0:4
    boxes, 4 score, 5 class, 6 zone bitmask (Z<=10 bits, exact in f32);
    row N carries `valid` in col 0 — so resolve pays exactly ONE fetch.
    """
    import jax
    import jax.numpy as jnp

    def _body(boxes, scores, classes, zbits):
        return jnp.concatenate([
            boxes.astype(jnp.float32),
            scores[..., None].astype(jnp.float32),
            classes[..., None].astype(jnp.float32),
            zbits[..., None].astype(jnp.float32),
        ], axis=-1)

    @jax.jit
    def pack(boxes, scores, classes, valid):
        body = _body(boxes, scores, classes,
                     jnp.zeros(scores.shape, jnp.float32))
        tail = jnp.zeros((body.shape[0], 1, body.shape[2]), jnp.float32)
        tail = tail.at[:, 0, 0].set(valid.astype(jnp.float32))
        return jnp.concatenate([body, tail], axis=1)

    @jax.jit
    def pack_zones(boxes, scores, classes, valid, zones_hit):
        # each zone becomes one bit of an f32-carried integer; beyond 24
        # bits the sum is no longer exactly representable and zone bits
        # would silently corrupt in transit
        assert zones_hit.shape[-1] <= 24, \
            'zone bitmask exceeds f32-exact range (24 bits)'
        weights = 2.0 ** jnp.arange(zones_hit.shape[-1], dtype=jnp.float32)
        zbits = jnp.sum(zones_hit.astype(jnp.float32) * weights, axis=-1)
        body = _body(boxes, scores, classes, zbits)
        tail = jnp.zeros((body.shape[0], 1, body.shape[2]), jnp.float32)
        tail = tail.at[:, 0, 0].set(valid.astype(jnp.float32))
        return jnp.concatenate([body, tail], axis=1)

    return pack, pack_zones


_PACKERS = None


def _get_packers():
    global _PACKERS
    if _PACKERS is None:
        _PACKERS = _make_packers()
    return _PACKERS


def _pack_outputs(out, zones_hit):
    """Pack a detection NamedTuple (+ optional zones) into one device
    array; returns the packed array (still on device, not fetched)."""
    pack, pack_zones = _get_packers()
    if zones_hit is not None:
        return pack_zones(out.boxes, out.scores, out.classes, out.valid,
                          zones_hit)
    return pack(out.boxes, out.scores, out.classes, out.valid)


def _make_fused_steps(detect_batch):
    """ONE jitted program per dispatch: detect + (filters) + pack.

    Separately dispatched stages (detect step, filter step, pack step)
    each pay a host->device call; on this rig's tunnel every dispatch is
    a measured ~27 ms round trip, and on a PCIe host each is a syscall +
    sync point. Composing them under one jit collapses the per-batch
    call count to one dispatch + one fetch. The inner ``detect_batch``
    is itself jitted — tracing inlines it, so the fused program compiles
    the same XLA graph plus the (tiny) filter/pack tail.
    """
    import jax

    from watsor_tpu.ops.filter_device import apply_filters_device_indexed

    pack, pack_zones = _get_packers()

    @jax.jit
    def step_plain(params, x):
        out = detect_batch(params, x)
        return pack(out.boxes, out.scores, out.classes, out.valid)

    @jax.jit
    def step_filtered(params, x, tables, row_idx):
        out = detect_batch(params, x)
        scores, classes, zones_hit, valid = apply_filters_device_indexed(
            out.boxes, out.scores, out.classes, *tables, row_idx)
        return pack_zones(out.boxes, scores, classes, valid, zones_hit)

    return step_plain, step_filtered


def _unpack_outputs(packed, n, with_zones, max_zones):
    """Host-side split of the packed fetch back into the detect_batch
    contract arrays (sliced to the real batch n)."""
    body = packed[:n, :-1, :]
    boxes = np.ascontiguousarray(body[..., 0:4])
    scores = np.ascontiguousarray(body[..., 4])
    classes = body[..., 5].astype(np.int32)
    valid = packed[:n, -1, 0].astype(np.int32)
    if not with_zones:
        return boxes, scores, classes, valid, None
    zbits = body[..., 6].astype(np.int64)
    zones_hit = (zbits[..., None] >> np.arange(max_zones)) & 1 != 0
    return boxes, scores, classes, valid, zones_hit


class DetectorBackend:
    """Protocol: batched uint8 frames in, padded detection arrays out."""

    device_name = 'unknown'
    input_hw: Tuple[int, int] = (300, 300)

    def detect_batch(self, images_u8: np.ndarray, senders=None):
        """images_u8: [B, H, W, 3] -> (boxes [B,N,4] normalized float32,
        scores [B,N] float32, classes [B,N] int32 1-based, valid [B] int32,
        device_ms float[, zones_hit [B,N,Z] bool when the backend filters
        on device]). ``senders`` optionally names the camera of each row so
        per-camera filter tables can apply."""
        raise NotImplementedError

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FleetBackend(DetectorBackend):
    """Sharded multi-chip detection: ONE step whose batch axis spans every
    chip of a mesh (watsor_tpu/parallel/fleet.py). The batch pads up to a
    multiple of the data-axis size so each chip gets an equal shard.

    Contrast with the reference's scale-out (one detector process per
    accelerator pulling single frames, detection/detector.py:40-50): here
    GSPMD splits one program across ICI and the pipeline sees a single,
    larger detector.
    """

    def __init__(self, fleet, max_batch=64, camera_tables=None,
                 zone_refiners=None, min_batch=None):
        import os

        self._fleet = fleet
        self._max_batch = max_batch
        self._lock = threading.Lock()
        self._packed_fetch = os.environ.get('WATSOR_PACKED_FETCH',
                                            '1') != '0'
        mesh = fleet.mesh
        self._data_size = mesh.shape.get('data', 1)
        # same floor-bucket contract as JaxDetectorBackend: pin ONE
        # program shape for an N-camera deployment instead of inline-
        # compiling each smaller bucket the first time it occurs
        if min_batch is None:
            min_batch = _min_bucket_env()
        self._min_bucket = min(_bucket(max(int(min_batch), 1)),
                               _bucket(max_batch))
        self.device_name = 'TPU MESH {}'.format(
            dict(zip(mesh.axis_names, mesh.devices.shape)))
        size = fleet.config.input_size
        self.input_hw = (size, size)
        from jax.sharding import NamedSharding, PartitionSpec
        self._table_store = None
        if camera_tables:
            # tables replicated over the mesh (device_put accepts a
            # Sharding wherever it accepts a Device)
            self._table_store = _FilterTableStore(
                camera_tables, NamedSharding(mesh, PartitionSpec()))
        self._zone_refiners = zone_refiners or {}
        self._fused_plain = self._fused_filtered = None
        if self._packed_fetch and \
                hasattr(fleet.detector.detect_batch, 'lower'):
            self._fused_plain, self._fused_filtered = _make_fused_steps(
                fleet.detector.detect_batch)

    def warmup(self, hw=None, batch=None):
        h, w = hw if hw is not None else self.input_hw
        batch = batch or self._data_size
        n = max(_bucket(batch), self._data_size, self._min_bucket)
        n = ((n + self._data_size - 1) // self._data_size) * self._data_size
        # warm the program production will actually run: with camera
        # tables configured every live batch takes the FILTERED fused
        # step, which is a different XLA program than the plain one —
        # warming only the plain step leaves a full model compile to
        # happen inline on the first real batch (minutes on this class
        # of hardware, mid-serving)
        senders = None
        if self._table_store is not None:
            senders = [self._table_store.names[0]] * n
        self.detect_batch(np.zeros((n, h, w, 3), np.uint8),
                          senders=senders)

    def dispatch(self, images_u8, senders=None):
        """Async launch across the mesh (same contract as
        JaxDetectorBackend.dispatch: caller double-buffers the input)."""
        n = images_u8.shape[0]
        target = max(_bucket(min(n, self._max_batch)), self._data_size,
                     self._min_bucket)
        target = ((target + self._data_size - 1) // self._data_size) * \
            self._data_size
        if n < target:
            pad = np.zeros((target - n,) + images_u8.shape[1:], np.uint8)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        row_idx = None
        if self._table_store is not None and senders is not None:
            row_idx = self._table_store.rows(senders, target)
        with self._lock:
            start = perf_counter()
            if self._fused_plain is not None:
                x = self._fleet.shard_batch(images_u8)
                if row_idx is not None:
                    payload = self._fused_filtered(
                        self._fleet.params, x, self._table_store.tables,
                        row_idx)
                else:
                    payload = self._fused_plain(self._fleet.params, x)
            else:
                out = self._fleet.detect(images_u8)
                zones_hit = None
                if row_idx is not None:
                    out, zones_hit = _apply_device_filters(
                        out, self._table_store, row_idx)
                payload = _pack_outputs(out, zones_hit) \
                    if self._packed_fetch else (out, zones_hit)
        return (payload, row_idx is not None, n, start, senders)

    def resolve(self, handle):
        import jax

        payload, with_zones, n, start, senders = handle
        if self._packed_fetch:
            arr = np.asarray(jax.block_until_ready(payload))
            device_ms = (perf_counter() - start) * 1000.0
            boxes, scores, classes, valid, zones_hit = _unpack_outputs(
                arr, n, with_zones, MAX_ZONES)
        else:
            out, zones_hit = payload
            out = jax.block_until_ready(out)
            device_ms = (perf_counter() - start) * 1000.0
            boxes = np.asarray(out.boxes, np.float32)[:n]
            scores = np.asarray(out.scores, np.float32)[:n]
            classes = np.asarray(out.classes, np.int32)[:n]
            valid = np.asarray(out.valid, np.int32)[:n]
            if zones_hit is not None:
                # np.asarray over device buffers is read-only zero-copy;
                # the refiner mutates, so materialize writable copies
                zones_hit = np.asarray(zones_hit)[:n].copy()
                scores, classes, valid = (scores.copy(), classes.copy(),
                                          valid.copy())
        if zones_hit is not None:
            if senders is not None and self._zone_refiners:
                _refine_zones(self._zone_refiners, senders, boxes, scores,
                              classes, valid, zones_hit)
            return boxes, scores, classes, valid, device_ms, zones_hit
        return boxes, scores, classes, valid, device_ms

    def detect_batch(self, images_u8, senders=None):
        return self.resolve(self.dispatch(images_u8, senders=senders))


class JaxDetectorBackend(DetectorBackend):
    """All-JAX detection: one jitted fused step (device resize + normalize +
    SSD forward + box decode + class-aware NMS) pinned to one device.

    Batches are padded up to a small set of size buckets so every batch
    shape hits the jit cache; the padded rows cost MXU cycles but no
    recompilation (static shapes are an XLA requirement, SURVEY.md §7).
    """

    def __init__(self, detector, device=None, max_batch=64,
                 camera_tables=None, zone_refiners=None, min_batch=None):
        import jax
        import os

        self._detector = detector
        self._device = device if device is not None else jax.devices()[0]
        self._max_batch = max_batch
        # floor bucket: every dispatch pads AT LEAST this high, so a
        # deployment with N cameras can pin ONE program shape (bucket(N))
        # instead of compiling each smaller bucket the first time a
        # partial batch happens to hit it — on a cold cache an inline
        # compile stalls the whole pipeline for minutes. Padding rows are
        # a few hundred KB of H2D and identical device work per step.
        if min_batch is None:
            min_batch = _min_bucket_env()
        self._min_bucket = min(_bucket(max(int(min_batch), 1)),
                               _bucket(max_batch))
        # packed single-fetch results (default on; WATSOR_PACKED_FETCH=0
        # restores the per-field fetches for comparison)
        self._packed_fetch = os.environ.get('WATSOR_PACKED_FETCH',
                                            '1') != '0'
        self._lock = threading.Lock()
        self.device_name = '{} {}'.format(self._device.platform.upper(),
                                          getattr(self._device, 'id', 0))
        cfg = detector.config
        self.input_hw = (cfg.input_size, cfg.input_size)
        self._params = jax.device_put(detector.params, self._device)
        # optional fused filtering: camera -> (conf[L], area[L], zone_sat,
        # zone_allow) device tables (ops/filter_device.py); when set, the
        # confidence/area/zone cascade runs ON DEVICE right after NMS and
        # the result carries zone hits
        self._table_store = None
        if camera_tables:
            self._table_store = _FilterTableStore(camera_tables,
                                                  self._device)
        self._zone_refiners = zone_refiners or {}
        self._fused_plain = self._fused_filtered = None
        # single-dispatch fusion only composes over a genuinely jitted
        # step (test doubles ship plain-numpy detect_batch fns that
        # cannot trace); they still get packed single-FETCH below
        if self._packed_fetch and hasattr(detector.detect_batch, 'lower'):
            self._fused_plain, self._fused_filtered = _make_fused_steps(
                detector.detect_batch)

    def warmup(self, hw: Optional[Tuple[int, int]] = None, batch: int = 1):
        """Compile the step for one (batch, resolution) combination ahead of
        time — the analog of the reference's offline TRT engine build
        (/root/reference/watsor/main_for_gpu.py:17-26)."""
        h, w = hw if hw is not None else self.input_hw
        b = max(_bucket(batch), self._min_bucket)
        dummy = np.zeros((b, h, w, 3), np.uint8)
        # with camera tables configured, production batches always run
        # the FILTERED fused program — warm that one, not the plain
        # variant that would never execute (see FleetBackend.warmup)
        senders = None
        if self._table_store is not None:
            senders = [self._table_store.names[0]] * b
        self.detect_batch(dummy, senders=senders)

    def dispatch(self, images_u8: np.ndarray, senders=None):
        """Launch H2D + the fused step WITHOUT blocking: JAX dispatch is
        asynchronous, so the uint8 transfer and the device step proceed
        while the caller stages the next batch — the TPU analog of the
        reference's async memcpy + stream sync
        (/root/reference/watsor/detection/tensorrt_gpu.py:145-160).

        Returns an opaque handle for :meth:`resolve`. The caller must not
        mutate ``images_u8`` until resolve returns (double-buffer it)."""
        import jax

        n = images_u8.shape[0]
        b = max(_bucket(min(n, self._max_batch)), self._min_bucket)
        if n < b:
            pad = np.zeros((b - n,) + images_u8.shape[1:], np.uint8)
            images_u8 = np.concatenate([images_u8, pad], axis=0)

        row_idx = None
        if self._table_store is not None and senders is not None:
            row_idx = self._table_store.rows(senders, b)

        with self._lock:
            start = perf_counter()
            x = jax.device_put(images_u8, self._device)
            if self._fused_plain is not None:
                # ONE dispatch (detect+filter+pack fused) and later ONE
                # fetch (see _make_fused_steps/_make_packers)
                if row_idx is not None:
                    payload = self._fused_filtered(
                        self._params, x, self._table_store.tables, row_idx)
                else:
                    payload = self._fused_plain(self._params, x)
            else:
                out = self._detector.detect_batch(self._params, x)
                zones_hit = None
                if row_idx is not None:
                    out, zones_hit = _apply_device_filters(
                        out, self._table_store, row_idx)
                payload = _pack_outputs(out, zones_hit) \
                    if self._packed_fetch else (out, zones_hit)
        return (payload, row_idx is not None, n, start, senders)

    def resolve(self, handle):
        """Block until a dispatched step completes; returns the standard
        detect_batch tuple."""
        import jax

        payload, with_zones, n, start, senders = handle
        if self._packed_fetch:
            # ONE fetch; np.asarray forces the actual D2H (on this rig
            # block_until_ready alone can return before the data landed)
            arr = np.asarray(jax.block_until_ready(payload))
            device_ms = (perf_counter() - start) * 1000.0
            boxes, scores, classes, valid, zones_hit = _unpack_outputs(
                arr, n, with_zones, MAX_ZONES)
        else:
            out, zones_hit = payload
            out = jax.block_until_ready(out)
            device_ms = (perf_counter() - start) * 1000.0
            # slice on the HOST: a device-side [:n] would dispatch extra
            # slice programs + separate transfers per field (the padded
            # tail is a few KB — cheaper to ship than to trim remotely)
            boxes = np.asarray(out.boxes, np.float32)[:n]
            scores = np.asarray(out.scores, np.float32)[:n]
            classes = np.asarray(out.classes, np.int32)[:n]
            valid = np.asarray(out.valid, np.int32)[:n]
            if zones_hit is not None:
                # np.asarray over device buffers is read-only zero-copy;
                # the refiner mutates, so materialize writable copies
                zones_hit = np.asarray(zones_hit)[:n].copy()
                scores, classes, valid = (scores.copy(), classes.copy(),
                                          valid.copy())
        if zones_hit is not None:
            if senders is not None and self._zone_refiners:
                _refine_zones(self._zone_refiners, senders, boxes, scores,
                              classes, valid, zones_hit)
            return boxes, scores, classes, valid, device_ms, zones_hit
        return boxes, scores, classes, valid, device_ms

    def detect_batch(self, images_u8: np.ndarray, senders=None):
        return self.resolve(self.dispatch(images_u8, senders=senders))
