"""Pallas NMS kernel agrees exactly with the XLA greedy formulation
(interpreter mode on the CPU backend; the same program compiles for TPU)."""

import numpy as np

import jax.numpy as jnp

from watsor_tpu.ops.nms import batched_class_aware_nms


def _random_candidates(seed, b=2, a=24, c=3):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0.2, 0.8, (b, a, 2)).astype(np.float32)
    sizes = rng.uniform(0.05, 0.35, (b, a, 2)).astype(np.float32)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).clip(0, 1)
    scores = rng.uniform(0, 1, (b, a, c)).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


def test_pallas_matches_exact_mode():
    boxes, scores = _random_candidates(0)
    exact = batched_class_aware_nms(boxes, scores, per_class_k=24,
                                    mode='exact')
    kernel = batched_class_aware_nms(boxes, scores, per_class_k=24,
                                     mode='pallas')
    np.testing.assert_allclose(np.asarray(exact[1]), np.asarray(kernel[1]),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(exact[2]),
                                  np.asarray(kernel[2]))
    np.testing.assert_array_equal(np.asarray(exact[3]),
                                  np.asarray(kernel[3]))


def test_pallas_multiple_seeds():
    for seed in range(1, 4):
        boxes, scores = _random_candidates(seed, b=1, a=16, c=2)
        exact = batched_class_aware_nms(boxes, scores, per_class_k=16,
                                        mode='exact')
        kernel = batched_class_aware_nms(boxes, scores, per_class_k=16,
                                         mode='pallas')
        np.testing.assert_allclose(np.asarray(exact[1]),
                                   np.asarray(kernel[1]), atol=1e-6)
