"""Batched device rendering: box overlays for MANY cameras in one TPU step.

The reference draws per frame with cv2 on the host
(/root/reference/watsor/output/draw.py) — at fleet scale (16-32 rendered
broadcast streams) that serializes on host cores. Here each camera's
visual-effects thread submits its frame to a shared ``DeviceRenderer``;
a collector thread gathers requests for a few milliseconds, pads them to a
size bucket, and renders every box of every frame in ONE device program
(ops/overlay.py: separable border masks contracted on the MXU). Labels are
stamped on the host afterwards (tiny text patches; see DeviceDrawEffect).

Requests are grouped per frame resolution; cameras of equal size batch
together.
"""

import threading
from queue import Empty, Queue
from time import monotonic

import numpy as np

from watsor_tpu.config.coco import get_coco_class
from watsor_tpu.runtime.frames import MAX_DETECTIONS

_BUCKETS = (1, 2, 4, 8, 16)


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class _Request:
    __slots__ = ('image', 'boxes', 'classes', 'result', 'done')

    def __init__(self, image, boxes, classes):
        self.image = image
        self.boxes = boxes
        self.classes = classes
        self.result = None
        self.done = threading.Event()


class DeviceRenderer:
    """Micro-batching collector around ops/overlay.render_detections."""

    def __init__(self, window_ms=3.0, max_batch=16, thickness=2):
        self._window = window_ms / 1000.0
        self._max_batch = max_batch
        self._thickness = thickness
        self._queues = {}          # (h, w) -> Queue of _Request
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = {}

    def close(self):
        self._stop.set()

    def _queue_for(self, shape):
        with self._lock:
            queue = self._queues.get(shape)
            if queue is None:
                queue = Queue()
                self._queues[shape] = queue
                thread = threading.Thread(
                    target=self._collector, args=(shape, queue),
                    name='render-{}x{}'.format(*shape), daemon=True)
                self._threads[shape] = thread
                thread.start()
            return queue

    def render(self, image_u8, boxes_px, classes, timeout=5.0):
        """Blocking: returns the rendered image (new array). boxes_px
        [N, 4] pixel ymin/xmin/ymax/xmax; classes [N] int32 (0 drops)."""
        request = _Request(image_u8, boxes_px, classes)
        self._queue_for(image_u8.shape[:2]).put(request)
        if not request.done.wait(timeout):
            return image_u8        # renderer overloaded: pass through
        return request.result

    def _collector(self, shape, queue):
        import jax.numpy as jnp

        from watsor_tpu.ops.overlay import render_detections

        h, w = shape
        while not self._stop.is_set():
            try:
                first = queue.get(timeout=0.2)
            except Empty:
                continue
            batch = [first]
            t0 = monotonic()
            while len(batch) < self._max_batch:
                remaining = self._window - (monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    batch.append(queue.get(timeout=remaining))
                except Empty:
                    break
            n = len(batch)
            b = _bucket(n)
            images = np.zeros((b, h, w, 3), np.uint8)
            boxes = np.zeros((b, MAX_DETECTIONS, 4), np.float32)
            classes = np.zeros((b, MAX_DETECTIONS), np.int32)
            for i, request in enumerate(batch):
                images[i] = request.image
                m = min(len(request.boxes), MAX_DETECTIONS)
                boxes[i, :m] = request.boxes[:m]
                classes[i, :m] = request.classes[:m]
            try:
                out = np.asarray(render_detections(
                    jnp.asarray(images), jnp.asarray(boxes),
                    jnp.asarray(classes), thickness=self._thickness))
            except Exception:
                out = images       # render failure: pass frames through
            for i, request in enumerate(batch):
                request.result = out[i]
                request.done.set()


class DeviceDrawEffect:
    """Drop-in for DrawEffect: box geometry renders on device (batched
    across cameras through a shared DeviceRenderer), labels stamp on the
    host afterwards."""

    def __init__(self, renderer: DeviceRenderer, draw_labels=True):
        self._renderer = renderer
        self._draw_labels = draw_labels

    def apply(self, frame_in, frame_out):
        detections = frame_out.detections_view()
        if not len(detections):
            return
        boxes = detections['bbox'].astype(np.float32)
        classes = detections['label'].astype(np.int32)
        rendered = self._renderer.render(frame_out.image, boxes, classes)
        np.copyto(frame_out.image, rendered)
        if self._draw_labels:
            import cv2
            for det in detections:
                style = get_coco_class(int(det['label']))
                y0, x0 = int(det['bbox'][0]), int(det['bbox'][1])
                text = '{} {:.0f}%'.format(
                    style.label, float(det['confidence']) * 100.0)
                cv2.putText(frame_out.image, text, (x0, max(y0 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, style.font_scale,
                            style.font_color, style.font_thickness,
                            cv2.LINE_AA)
