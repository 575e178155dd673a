"""Batched device renderer: concurrent camera threads batch into one
device step; the effect draws borders + labels into the out frame."""

import threading
import time

import numpy as np
import pytest

from watsor_tpu.config.coco import coco_label_index
from watsor_tpu.output.device_render import DeviceDrawEffect, DeviceRenderer
from watsor_tpu.runtime.frames import DETECTION_DTYPE, FrameBuffer

PERSON = coco_label_index('person')


@pytest.fixture
def renderer():
    r = DeviceRenderer(window_ms=20, max_batch=8)
    yield r
    r.close()


def test_concurrent_requests_render_independently(renderer):
    results = {}

    def submit(tid):
        image = np.zeros((32, 32, 3), np.uint8)
        boxes = np.array([[4 + tid, 4, 24 + tid, 24]], np.float32)
        classes = np.array([PERSON], np.int32)
        results[tid] = renderer.render(image, boxes, classes)

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(10)
    for tid, out in results.items():
        assert out.shape == (32, 32, 3)
        # top edge of the box got colored
        assert out[4 + tid, 14].sum() > 0, 'no border for request %d' % tid
        assert out[30, 30].sum() == 0


def test_effect_draws_into_out_frame(renderer):
    buffer = FrameBuffer(2, 48, 32)
    frame_in, frame_out = buffer.frames[0], buffer.frames[1]
    records = np.zeros(1, DETECTION_DTYPE)
    records[0]['label'] = PERSON
    records[0]['confidence'] = 0.87
    records[0]['bbox'] = (6, 6, 26, 40)
    frame_out.set_detections(records)
    frame_out.image[:] = 0

    effect = DeviceDrawEffect(renderer, draw_labels=False)
    effect.apply(frame_in, frame_out)
    assert frame_out.image[6, 20].sum() > 0, 'border missing'
    assert frame_out.image[16, 20].sum() == 0, 'interior painted'


def test_no_detections_is_noop(renderer):
    buffer = FrameBuffer(2, 48, 32)
    frame_in, frame_out = buffer.frames[0], buffer.frames[1]
    frame_out.image[:] = 7
    DeviceDrawEffect(renderer).apply(frame_in, frame_out)
    assert (frame_out.image == 7).all()
