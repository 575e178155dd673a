"""Detection post-processing parity against TensorFlow: our exact NMS mode
reproduces tf.image.combined_non_max_suppression (the op the reference's
frozen graphs run on every backend) on identical inputs."""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp

from watsor_tpu.ops.nms import batched_class_aware_nms


def _random_case(seed, b=2, a=48, c=4):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0.25, 0.75, (b, a, 2)).astype(np.float32)
    sizes = rng.uniform(0.08, 0.3, (b, a, 2)).astype(np.float32)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).clip(0, 1).astype(np.float32)
    scores = rng.uniform(0.0, 1.0, (b, a, c)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_exact_mode_matches_tf_combined_nms(seed):
    boxes, scores = _random_case(seed)
    iou_threshold, score_threshold, max_out = 0.6, 0.2, 20

    tf_boxes, tf_scores, tf_classes, tf_valid = \
        tf.image.combined_non_max_suppression(
            boxes[:, :, None, :],          # shared boxes across classes
            scores,
            max_output_size_per_class=48,
            max_total_size=max_out,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            clip_boxes=False)

    ours = batched_class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        iou_threshold=iou_threshold, score_threshold=score_threshold,
        max_detections=max_out, per_class_k=48, mode='exact')
    our_boxes, our_scores, our_classes, our_valid = \
        (np.asarray(x) for x in ours)

    np.testing.assert_array_equal(our_valid, tf_valid.numpy())
    for b in range(boxes.shape[0]):
        n = int(tf_valid[b])
        np.testing.assert_allclose(our_scores[b, :n],
                                   tf_scores[b, :n].numpy(), atol=1e-6)
        # our classes are 1-based (reference label offset); TF's 0-based
        np.testing.assert_array_equal(our_classes[b, :n] - 1,
                                      tf_classes[b, :n].numpy()
                                      .astype(np.int32))
        np.testing.assert_allclose(our_boxes[b, :n],
                                   tf_boxes[b, :n].numpy(), atol=1e-6)
