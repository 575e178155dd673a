"""Device-side detection filtering: per-class confidence/area thresholds
and zone-mask tests as one vectorized jit step.

The reference filters per detection in Python (confidence.py/area.py/
mask.py drive shapely + scalar loops). The host cascade in
watsor_tpu/filters is already vectorized numpy; this module goes one step
further and evaluates the whole batch ON DEVICE so filtering fuses with the
detection step — detections from frames of different cameras carry
different thresholds, so every table is batched per frame row:

  conf_table [B, L]   min confidence per label (inf = class not watched)
  area_table [B, L]   min bbox area as a fraction of the frame
  zone_sat   [B, Z, Hd+1, Wd+1]  per-zone summed-area tables on a fixed
                                 downsampled grid (0 rows disable zones)
  zone_allow [B, Z, L] bool      which zones admit which labels

Zone rasterization reuses filters/mask.ZoneMask; `zone_tables` converts a
ZoneMask + per-class config into the device tables.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from watsor_tpu.config.coco import (COCO_CLASSES, DEFAULT_AREA,
    DEFAULT_CONFIDENCE, iter_detect_entries)
from watsor_tpu.runtime.frames import MAX_ZONES

# fixed zone-grid resolution on device: fine enough for camera zones, small
# enough that 32 cameras x 10 zones of SATs stay under ~15 MB
ZONE_GRID = 96

NUM_LABELS = len(COCO_CLASSES)


def threshold_tables(detect_config):
    """Per-camera [L] confidence (0-1) and area-fraction tables; labels not
    configured get +inf (drop)."""
    conf = np.full(NUM_LABELS, np.inf, np.float32)
    area = np.full(NUM_LABELS, np.inf, np.float32)
    for label, _, options in iter_detect_entries(detect_config):
        conf[label] = options.get('confidence', DEFAULT_CONFIDENCE) / 100.0
        area[label] = options.get('area', DEFAULT_AREA) / 100.0
    return conf, area


def zone_tables(zone_mask, detect_config, max_zones=MAX_ZONES,
                grid=ZONE_GRID):
    """ZoneMask -> ([Z, grid+1, grid+1] SATs of the downsampled zone masks,
    [Z, L] allow matrix). When ``zone_mask`` is None returns zeros (zones
    disabled: every detection passes the zone test)."""
    import cv2

    sats = np.zeros((max_zones, grid + 1, grid + 1), np.float32)
    allow = np.zeros((max_zones, NUM_LABELS), bool)
    if zone_mask is None:
        return sats, allow
    for z in range(1, zone_mask.num_zones + 1):
        mask = (zone_mask.index_map == z).astype(np.float32)
        # OVER-approximate: a cell is marked when ANY zone pixel falls in
        # it (INTER_AREA average > 0), and the device query expands box
        # corners outward (floor/ceil) — so the device test never drops a
        # detection the full-resolution test would keep; false keeps in
        # the <=1-cell boundary band are removed exactly by ZoneRefiner
        small = cv2.resize(mask, (grid, grid),
                           interpolation=cv2.INTER_AREA) > 0.0
        sats[z - 1, 1:, 1:] = np.cumsum(np.cumsum(small, axis=0), axis=1)
    # per-label allow lists (empty zones list = all zones allowed)
    for label, _, options in iter_detect_entries(detect_config):
        zones = options.get('zones') or []
        if zones:
            for z in zones:
                if 1 <= z <= max_zones:
                    allow[z - 1, label] = True
        else:
            allow[:zone_mask.num_zones, label] = True
    return sats, allow


class ZoneRefiner:
    """Exact full-resolution zone pass over device-filtered survivors.

    The device zone test over-approximates (see ``zone_tables``), so it
    never drops a true detection; the handful of keeps in the <=1-cell
    boundary band are re-tested here with the full-res integral image —
    four lookups per (detection, zone) — making the fused path bit-exact
    with the host cascade (/root/reference/watsor/filter/mask.py:44-59
    semantics). Cost: ~N_kept x Z numpy lookups per frame.
    """

    def __init__(self, zone_mask, detect_config, max_zones=MAX_ZONES):
        self._zone_mask = zone_mask
        znum = zone_mask.num_zones
        self.max_zones = max_zones
        # [L, Z] allow matrix (empty zones list = every zone allowed),
        # mirroring filters/mask.MaskFilter._allowed
        allow = np.zeros((NUM_LABELS, znum), bool)
        for label, _, options in iter_detect_entries(detect_config):
            zones = options.get('zones') or []
            if zones:
                for z in zones:
                    if 1 <= z <= znum:
                        allow[label, z - 1] = True
            else:
                allow[label, :] = True
        self._allow = allow

    def __call__(self, boxes_norm, labels):
        """boxes_norm [n,4] normalized ymin/xmin/ymax/xmax; labels [n]
        int -> (keep [n] bool, zones_hit [n, max_zones] bool), exact."""
        n = len(boxes_norm)
        hit_out = np.zeros((n, self.max_zones), bool)
        if n == 0:
            return np.zeros(0, bool), hit_out
        h, w = self._zone_mask.shape
        px = np.asarray(boxes_norm, np.float32) * \
            np.array([h, w, h, w], np.float32)
        overlap = self._zone_mask.bbox_zone_overlap(px)      # [n, znum]
        hit = overlap > 0
        labels = np.clip(np.asarray(labels, np.int64), 0, NUM_LABELS - 1)
        keep = (hit & self._allow[labels]).any(axis=1)
        hit_out[:, :hit.shape[1]] = hit
        return keep, hit_out


@jax.jit
def apply_filters_device_indexed(boxes, scores, classes, conf_all,
                                 area_all, zone_sat_all, zone_allow_all,
                                 row_idx):
    """Like :func:`apply_filters_device`, but the per-row tables are
    selected ON DEVICE from per-camera stores by ``row_idx`` [B] int32 —
    the tables stay resident in HBM and a dispatch ships only the index
    vector (detection/backend._FilterTableStore)."""
    return apply_filters_device(
        boxes, scores, classes,
        conf_all[row_idx], area_all[row_idx],
        zone_sat_all[row_idx], zone_allow_all[row_idx])


@partial(jax.jit, static_argnames=())
def apply_filters_device(boxes, scores, classes, conf_table, area_table,
                         zone_sat, zone_allow):
    """Filter a padded detection batch on device.

    boxes [B, N, 4] normalized; scores [B, N]; classes [B, N] int32
    (0 = padding). Returns (scores, classes, zones_hit [B, N, Z] bool,
    valid [B]) with dropped detections zeroed out — shapes stay static.
    """
    B, N, _ = boxes.shape
    Z = zone_sat.shape[1]
    grid = zone_sat.shape[2] - 1
    labels = jnp.clip(classes, 0, NUM_LABELS - 1)

    min_conf = jnp.take_along_axis(conf_table, labels, axis=1)     # [B, N]
    min_area = jnp.take_along_axis(area_table, labels, axis=1)
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    keep = (scores >= min_conf) & (area >= min_area) & (classes > 0)

    # zone test: integral-image lookups on the downsampled grid
    y0 = jnp.clip(jnp.floor(boxes[..., 0] * grid), 0, grid).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(boxes[..., 1] * grid), 0, grid).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(boxes[..., 2] * grid), 0, grid).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(boxes[..., 3] * grid), 0, grid).astype(jnp.int32)

    def per_image(sat, y0i, x0i, y1i, x1i):
        # sat [Z, g+1, g+1]; indices [N] -> overlap [N, Z]
        def corner(yy, xx):
            return sat[:, yy, xx]                       # [Z, N]
        total = corner(y1i, x1i) - corner(y0i, x1i) - \
            corner(y1i, x0i) + corner(y0i, x0i)
        return jnp.transpose(total)                     # [N, Z]

    overlap = jax.vmap(per_image)(zone_sat, y0, x0, y1, x1)  # [B, N, Z]
    zones_hit = overlap > 0.0

    zones_enabled = jnp.any(zone_sat != 0.0, axis=(1, 2, 3))     # [B]
    allow_nl = jnp.take_along_axis(
        jnp.transpose(zone_allow, (0, 2, 1)),            # [B, L, Z]
        labels[..., None], axis=1)                       # [B, N, Z]
    zone_ok = jnp.any(zones_hit & allow_nl, axis=-1)     # [B, N]
    keep = keep & (zone_ok | ~zones_enabled[:, None])

    out_scores = jnp.where(keep, scores, 0.0)
    out_classes = jnp.where(keep, classes, 0)
    zones_hit = zones_hit & keep[..., None]
    valid = jnp.sum(keep.astype(jnp.int32), axis=-1)
    return out_scores, out_classes, zones_hit, valid
