import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.ops.anchors import Anchors
from ood_object_detection_tpu.ops.box_coder import encode_boxes
from ood_object_detection_tpu.ops.ood import energy_score, max_logit_score, msp_score
from ood_object_detection_tpu.ops.post_process import (
    batch_detection,
    generate_detections,
    post_process,
)

C = 6  # classes


@pytest.fixture(scope="module")
def setup():
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=C).replace(
        image_size=(128, 128))
    anchors = Anchors.from_config(cfg)
    return cfg, anchors


def _head_outputs(anchors, rng, batch=2, bias=-6.0):
    cls_out, box_out = [], []
    fs = anchors.feat_sizes
    for lvl in range(anchors.min_level, anchors.max_level + 1):
        h, w = fs[lvl]
        cls_out.append(rng.normal(bias, 1, (batch, h, w, 9 * C)).astype(np.float32))
        box_out.append(rng.normal(0, 0.1, (batch, h, w, 36)).astype(np.float32))
    return cls_out, box_out


def test_post_process_topk_matches_numpy(setup, rng):
    """Top-k selection parity with a straightforward numpy implementation
    (reference _post_process semantics, effdet/bench.py:12-56)."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng)
    k = 50
    cls_topk, box_topk, indices, classes = post_process(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out],
        num_classes=C, max_detection_points=k, topk_method="exact")

    B = 2
    cls_all = np.concatenate([c.reshape(B, -1, C) for c in cls_out], 1)
    box_all = np.concatenate([b.reshape(B, -1, 4) for b in box_out], 1)
    flat = cls_all.reshape(B, -1)
    for b in range(B):
        ref_idx = np.argsort(-flat[b], kind="stable")[:k]
        got_vals = flat[b][np.asarray(indices)[b] * C + np.asarray(classes)[b]]
        np.testing.assert_allclose(np.sort(got_vals), np.sort(flat[b][ref_idx]),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cls_topk)[b, :, 0], got_vals, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(box_topk)[b], box_all[b][np.asarray(indices)[b]],
            rtol=1e-6)


def test_approx_topk_recall(setup, rng):
    """approx_max_k finds (nearly) all of the exact top-k; the highest
    scores are always found."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng)
    k = 200
    args = ([jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out])
    _, _, idx_e, cls_e = post_process(*args, num_classes=C,
                                      max_detection_points=k,
                                      topk_method="exact")
    _, _, idx_a, cls_a = post_process(*args, num_classes=C,
                                      max_detection_points=k,
                                      topk_method="approx", topk_recall=0.95)
    exact = {(int(a), int(c)) for a, c in
             zip(np.asarray(idx_e)[0], np.asarray(cls_e)[0])}
    approx = {(int(a), int(c)) for a, c in
              zip(np.asarray(idx_a)[0], np.asarray(cls_a)[0])}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.9
    # nearly all of the top-20 are present (approx_max_k's per-tile
    # reduction can drop one of two top values landing in the same tile)
    top20 = {(int(a), int(c)) for a, c in
             zip(np.asarray(idx_e)[0][:20], np.asarray(cls_e)[0][:20])}
    assert len(top20 & approx) >= 18


def test_detection_recovers_planted_box(setup, rng):
    """Plant one confident anchor: the decoded detection must come back."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-8.0)

    # pick an anchor in level 0 and give it a strong class-2 logit and a
    # known box regression toward a target box
    target_box = np.array([30.0, 40.0, 80.0, 100.0], np.float32)  # yxyx
    a_idx = 777
    anchor = anchors.boxes[a_idx]
    code = np.asarray(encode_boxes(target_box[None], anchor[None]))[0]

    cell = a_idx // 9
    a_in_cell = a_idx % 9
    h = w = 16
    r, c_ = divmod(cell, w)
    cls_out[0][0, r, c_, a_in_cell * C + 2] = 6.0
    box_out[0][0, r, c_, a_in_cell * 4:(a_in_cell + 1) * 4] = code

    dets, _ = generate_detections(
        [jnp.asarray(x) for x in cls_out], [jnp.asarray(x) for x in box_out],
        anchors.boxes, num_classes=C, max_detection_points=100,
        max_det_per_image=10)
    d = np.asarray(dets)[0]
    assert d[0, 4] > 0.9                       # sigmoid(6) ~ 0.9975
    assert d[0, 5] == 3.0                      # class 2 + 1
    # detection box is xyxy
    np.testing.assert_allclose(
        d[0, :4], [40.0, 30.0, 100.0, 80.0], atol=0.5)


def test_detection_score_floor(setup, rng):
    """Nothing below the 0.01 score pre-filter survives."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-12.0)
    dets, _ = generate_detections(
        [jnp.asarray(x) for x in cls_out], [jnp.asarray(x) for x in box_out],
        anchors.boxes, num_classes=C, max_detection_points=100,
        max_det_per_image=10)
    assert np.all(np.asarray(dets)[..., 4] == 0.0)


def test_img_scale_rescaling(setup, rng):
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-8.0)
    cls_out[0][0, 4, 4, 2] = 5.0
    args = ([jnp.asarray(x) for x in cls_out], [jnp.asarray(x) for x in box_out],
            anchors.boxes)
    kw = dict(num_classes=C, max_detection_points=100, max_det_per_image=5)
    dets1, _ = generate_detections(*args, **kw)
    dets2, _ = generate_detections(
        *args, img_scale=jnp.asarray([[2.0]]),
        img_size=jnp.asarray([[1000.0, 1000.0]]), **kw)
    d1 = np.asarray(dets1)[0, 0]
    d2 = np.asarray(dets2)[0, 0]
    np.testing.assert_allclose(d2[:4], d1[:4] * 2.0, rtol=1e-5)
    np.testing.assert_allclose(d2[4:], d1[4:], rtol=1e-6)


def test_ood_scores():
    logits = np.array([[1.0, 2.0, 3.0], [-5.0, -5.0, -5.0]], np.float32)
    e = np.asarray(energy_score(logits))
    np.testing.assert_allclose(
        e[0], np.log(np.exp(1) + np.exp(2) + np.exp(3)), rtol=1e-4)
    m = np.asarray(max_logit_score(logits))
    np.testing.assert_allclose(m, [3.0, -5.0])
    p = np.asarray(msp_score(logits))
    assert p[0] > p[1]


def test_ood_gathered_at_detections(setup, rng):
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-8.0)
    cls_out[0][0, 4, 4, 2] = 5.0    # one confident detection
    dets, ood = generate_detections(
        [jnp.asarray(x) for x in cls_out], [jnp.asarray(x) for x in box_out],
        anchors.boxes, num_classes=C, max_detection_points=100,
        max_det_per_image=5, ood_method="energy")
    d = np.asarray(dets)[0]
    o = np.asarray(ood)[0]
    valid = d[:, 4] > 0
    # the confident anchor's energy is dominated by the 5.0 logit
    assert o[0] > 4.5
    # padding rows carry 0
    np.testing.assert_allclose(o[~valid], 0.0)
