"""NMS semantics: quantifies fused (Fast-NMS) vs exact (greedy) divergence
on chained-overlap scenes — the NVR hot case (crowds) — and proves the
``fused_exact`` mode reaches greedy's fixed point at fused cost.

The reference's NMS semantics come from its frozen graphs / TRT plugin
(/root/reference/watsor/detection/tensorrt_gpu.py:184-188); greedy is the
convention every SSD checkpoint was evaluated with."""

import numpy as np
import jax.numpy as jnp

from watsor_tpu.ops.nms import batched_class_aware_nms


def _chain_boxes():
    """Three boxes A > B > C by score where IoU(A,B) and IoU(B,C) exceed the
    threshold but IoU(A,C) does not: greedy keeps {A, C}; Fast-NMS also
    drops C (B, though suppressed, still suppresses it)."""
    boxes = np.array([[[0.00, 0.00, 0.40, 1.00],     # A
                       [0.15, 0.00, 0.55, 1.00],     # B: IoU(A,B) ~ 0.45
                       [0.30, 0.00, 0.70, 1.00]]],   # C: IoU(B,C) ~ 0.45,
                     np.float32)                     #    IoU(A,C) ~ 0.14
    scores = np.array([[[0.9], [0.8], [0.7]]], np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


def _kept(result):
    b, s, c, v = result
    n = int(v[0])
    return {(round(float(x), 4) for x in row) and tuple(
        round(float(x), 4) for x in b[0, i]) for i, row in
        enumerate(b[0, :n])}, n


def test_chain_divergence_fused_vs_exact():
    boxes, scores = _chain_boxes()
    kw = dict(iou_threshold=0.4, score_threshold=0.1, max_detections=10)
    _, _, _, v_exact = batched_class_aware_nms(boxes, scores, mode='exact',
                                               **kw)
    _, _, _, v_fused = batched_class_aware_nms(boxes, scores, mode='fused',
                                               **kw)
    _, _, _, v_fx = batched_class_aware_nms(boxes, scores,
                                            mode='fused_exact', **kw)
    assert int(v_exact[0]) == 2, 'greedy must keep A and C'
    assert int(v_fused[0]) == 1, 'Fast-NMS over-suppresses the chain'
    assert int(v_fx[0]) == 2, 'fused_exact must reach the greedy fixed point'


def test_fused_kept_is_subset_of_exact():
    """Fast-NMS only ever suppresses MORE than greedy: on any scene the
    fused kept set is a subset of the exact kept set (same candidates)."""
    rng = np.random.default_rng(7)
    B, A, C = 4, 96, 3
    centers = rng.uniform(0.2, 0.8, (B, A, 2))
    sizes = rng.uniform(0.05, 0.3, (B, A, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, A, C)).astype(np.float32)
    # max_detections > any possible kept count: the subset property holds on
    # the full kept sets, not on top-k truncations of differently-sized sets
    kw = dict(iou_threshold=0.5, score_threshold=0.3, max_detections=A * C)
    eb, es, ec, ev = batched_class_aware_nms(jnp.asarray(boxes),
                                             jnp.asarray(scores),
                                             mode='exact', per_class_k=A,
                                             **kw)
    fb, fs, fc, fv = batched_class_aware_nms(jnp.asarray(boxes),
                                             jnp.asarray(scores),
                                             mode='fused', **kw)
    for i in range(B):
        exact_set = {(float(es[i, j]), int(ec[i, j]))
                     for j in range(int(ev[i]))}
        fused_set = {(float(fs[i, j]), int(fc[i, j]))
                     for j in range(int(fv[i]))}
        assert fused_set <= exact_set, (i, fused_set - exact_set)
        assert int(fv[i]) <= int(ev[i])


def test_fused_exact_matches_classic_exact_when_union_covers():
    """With <= union_m candidates the preselection is complete, so
    fused_exact must produce EXACTLY the classic greedy result (same boxes,
    scores, classes, valid counts) — dense random clusters included."""
    rng = np.random.default_rng(3)
    B, A, C = 6, 128, 4
    centers = rng.uniform(0.3, 0.7, (B, A, 2))     # heavy clustering
    sizes = rng.uniform(0.1, 0.4, (B, A, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).clip(0, 1).astype(np.float32)
    scores = rng.uniform(0, 1, (B, A, C)).astype(np.float32)
    kw = dict(iou_threshold=0.5, score_threshold=0.05, max_detections=50)
    eb, es, ec, ev = batched_class_aware_nms(jnp.asarray(boxes),
                                             jnp.asarray(scores),
                                             mode='exact', per_class_k=A,
                                             **kw)
    xb, xs, xc, xv = batched_class_aware_nms(jnp.asarray(boxes),
                                             jnp.asarray(scores),
                                             mode='fused_exact', **kw)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(xv))
    np.testing.assert_allclose(np.asarray(es), np.asarray(xs), atol=0)
    np.testing.assert_array_equal(np.asarray(ec), np.asarray(xc))
    np.testing.assert_allclose(np.asarray(eb), np.asarray(xb), atol=0)


def test_nms_mode_configurable_in_yaml():
    from watsor_tpu.config import parse, validate
    config = validate(parse(data=(
        'nms: exact\n'
        'cameras:\n'
        '  - cam1:\n'
        '      width: 64\n'
        '      height: 48\n'
        '      input: synthetic://shapes\n'
        '      detect: [person: ]\n'
        '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n')))
    assert config['nms'] == 'exact'
    # default
    config = validate(parse(data=(
        'cameras:\n'
        '  - cam1:\n'
        '      width: 64\n'
        '      height: 48\n'
        '      input: synthetic://shapes\n'
        '      detect: [person: ]\n'
        '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n')))
    assert config['nms'] == 'fused_exact'
    import pytest
    with pytest.raises(ValueError):
        validate(parse(data=(
            'nms: bogus\n'
            'cameras:\n'
            '  - cam1:\n'
            '      width: 64\n'
            '      height: 48\n'
            '      input: synthetic://shapes\n'
            '      detect: [person: ]\n'
            '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n')))
