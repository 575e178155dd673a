"""Device overlay kernel: border geometry, color mapping, padding rows."""

import numpy as np

import jax.numpy as jnp

from watsor_tpu.ops.overlay import render_boxes


def test_draws_border_only_inside_box_extent():
    frames = np.zeros((1, 32, 32, 3), np.uint8)
    boxes = np.zeros((1, 2, 4), np.float32)
    boxes[0, 0] = [8, 8, 24, 24]
    classes = np.zeros((1, 2), np.int32)
    classes[0, 0] = 1
    table = np.array([[0, 0, 0], [200, 10, 10]], np.uint8)
    out = np.asarray(render_boxes(jnp.asarray(frames), jnp.asarray(boxes),
                                  jnp.asarray(classes), jnp.asarray(table),
                                  thickness=1))
    assert out[0, 8, 16, 0] > 150          # top edge colored (R)
    assert out[0, 16, 8, 0] > 150          # left edge colored
    assert out[0, 16, 16].sum() == 0       # interior untouched
    assert out[0, 2, 2].sum() == 0         # outside untouched


def test_padding_class_zero_not_drawn():
    frames = np.zeros((1, 16, 16, 3), np.uint8)
    boxes = np.zeros((1, 1, 4), np.float32)
    boxes[0, 0] = [2, 2, 12, 12]
    classes = np.zeros((1, 1), np.int32)   # padding
    table = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    out = np.asarray(render_boxes(jnp.asarray(frames), jnp.asarray(boxes),
                                  jnp.asarray(classes), jnp.asarray(table)))
    assert out.sum() == 0


def test_batch_isolation():
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    boxes = np.zeros((2, 1, 4), np.float32)
    boxes[0, 0] = [4, 4, 12, 12]
    classes = np.zeros((2, 1), np.int32)
    classes[0, 0] = 1                       # only image 0 has a box
    table = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    out = np.asarray(render_boxes(jnp.asarray(frames), jnp.asarray(boxes),
                                  jnp.asarray(classes), jnp.asarray(table)))
    assert out[0].sum() > 0
    assert out[1].sum() == 0
