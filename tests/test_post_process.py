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


def test_topk_method_map_equivalence(setup, rng):
    """Quantify the approximation the fast top-k paths take vs 'exact'
    (VERDICT: the default per_anchor path changes selection semantics vs
    the reference's global [A*C] top-k): planted detections must yield
    near-identical mAP@0.5 across topk_method settings."""
    from ood_object_detection_tpu.evaluation import PascalEvaluator

    cfg, anchors = setup
    batch, n_obj = 8, 5
    fs = anchors.feat_sizes
    cls_out, box_out = [], []
    level_dims = []
    for lvl in range(anchors.min_level, anchors.max_level + 1):
        h, w = fs[lvl]
        cls_out.append(np.full((batch, h, w, 9 * C), -6.0, np.float32)
                       + rng.normal(0, 0.3, (batch, h, w, 9 * C)))
        box_out.append(np.zeros((batch, h, w, 36), np.float32))
        level_dims.append((h, w))

    boxes = anchors.boxes  # [A, 4] yxyx
    gt_bbox = np.zeros((batch, n_obj, 4), np.float32)
    gt_cls = np.zeros((batch, n_obj), np.int32)
    for b in range(batch):
        used = set()
        for o in range(n_obj):
            while True:
                li = int(rng.integers(0, len(level_dims)))
                h, w = level_dims[li]
                y, x, k = (int(rng.integers(0, h)), int(rng.integers(0, w)),
                           int(rng.integers(0, 9)))
                # distinct anchors: two classes on ONE anchor is the known
                # semantic difference ('exact' emits both, 'per_anchor'
                # keeps the argmax class) — measured separately below
                if (li, y, x, k) not in used:
                    used.add((li, y, x, k))
                    break
            c = int(rng.integers(0, C))
            cls_out[li][b, y, x, k * C + c] = 3.0 + float(rng.uniform(0, 2))
            offset = sum(hh * ww * 9 for hh, ww in level_dims[:li])
            flat = offset + (y * w + x) * 9 + k
            gt_bbox[b, o] = boxes[flat]
            gt_cls[b, o] = c + 1

    cls_j = [jnp.asarray(c_) for c_ in cls_out]
    box_j = [jnp.asarray(b_) for b_ in box_out]
    anchor_boxes = jnp.asarray(boxes)

    maps = {}
    for method in ("exact", "per_anchor", "approx"):
        dets, _ = generate_detections(
            cls_j, box_j, anchor_boxes, num_classes=C,
            max_detection_points=1000, max_det_per_image=20,
            topk_method=method, topk_recall=0.95)
        ev = PascalEvaluator(C)
        ev.add_predictions(np.asarray(dets),
                           {"bbox": gt_bbox, "cls": gt_cls})
        maps[method] = float(ev.evaluate()["mAP@0.5IOU"])

    print("topk mAP:", maps)
    assert maps["exact"] > 0.9, maps
    assert abs(maps["exact"] - maps["per_anchor"]) <= 0.02, maps
    assert abs(maps["exact"] - maps["approx"]) <= 0.05, maps


def test_per_anchor_collision_semantics(setup):
    """The one semantic difference of the default fast path: two classes
    peaking on the SAME anchor yield two detections under 'exact'
    (global [A*C] top-k, the reference semantics, bench.py:12-56) but one
    under 'per_anchor' (argmax class per anchor)."""
    cfg, anchors = setup
    fs = anchors.feat_sizes
    cls_out, box_out = [], []
    for lvl in range(anchors.min_level, anchors.max_level + 1):
        h, w = fs[lvl]
        cls_out.append(np.full((1, h, w, 9 * C), -8.0, np.float32))
        box_out.append(np.zeros((1, h, w, 36), np.float32))
    # classes 0 and 3 both hot on one anchor
    cls_out[0][0, 2, 2, 0 * C + 0] = 4.0
    cls_out[0][0, 2, 2, 0 * C + 3] = 3.5

    args = dict(num_classes=C, max_detection_points=100,
                max_det_per_image=10)
    d_exact, _ = generate_detections(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out],
        jnp.asarray(anchors.boxes), topk_method="exact", **args)
    d_pa, _ = generate_detections(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out],
        jnp.asarray(anchors.boxes), topk_method="per_anchor", **args)
    n_exact = int((np.asarray(d_exact)[0, :, 4] > 0.5).sum())
    n_pa = int((np.asarray(d_pa)[0, :, 4] > 0.5).sum())
    assert n_exact == 2
    assert n_pa == 1
    # and the one kept is the argmax class
    kept = np.asarray(d_pa)[0, 0]
    assert int(kept[5]) == 1  # class 0, 1-based


def test_packed_f32_key_roundtrip(rng):
    """The 24-bit f32 key carries (bf16 logit, class) exactly: reduce +
    unpack == separate max/argmax reduces, for any sign/magnitude."""
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.post_process import (
        _packed_f32_key_reduce, _per_anchor_reduce, _unpack_f32_key)

    b, c, a = 2, 90, 3
    lvls = [jnp.asarray(rng.normal(0, 4, (b, h, h, a * c)).astype(np.float32))
            .astype(jnp.bfloat16) for h in (6, 3)]
    key, _ = _packed_f32_key_reduce(lvls, c)
    logits, classes = _unpack_f32_key(key)
    max_all, arg_all, _ = _per_anchor_reduce(lvls, c)
    np.testing.assert_array_equal(
        np.asarray(logits, np.float32),
        np.asarray(max_all).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(classes), np.asarray(arg_all))


def test_packed_f32_key_tie_break(rng):
    """Equal bf16 logits across classes -> lowest class id wins (argmax
    convention)."""
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.post_process import (
        _packed_f32_key_reduce, _unpack_f32_key)
    c = 5
    lvl = jnp.zeros((1, 1, 1, c), jnp.bfloat16)     # all-tied logits
    _, classes = _unpack_f32_key(_packed_f32_key_reduce([lvl], c)[0])
    assert int(classes[0, 0]) == 0


def test_generate_detections_bf16_packed_matches_f32(setup, rng):
    """bf16 packed-f32-key path == f32 two-reduce path on the same
    (bf16-representable) logits."""
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.post_process import generate_detections

    cfg, anchors = setup
    # sparse confident candidates (background elsewhere) + exact top-k so
    # both paths select the identical candidate set — any difference then
    # is a packing bug, not approx_max_k divergence
    cls_out, box_out = _head_outputs(anchors, rng, bias=-10.0)
    for i in range(40):
        lvl = i % len(cls_out)
        h = cls_out[lvl].shape[1]
        cls_out[lvl][i % 2, (7 * i) % h, (3 * i) % h, i % (9 * C)] = \
            2.0 + 0.05 * i
    cls_bf = [jnp.asarray(c).astype(jnp.bfloat16) for c in cls_out]
    cls_f32 = [c.astype(jnp.float32) for c in cls_bf]
    box_bf = [jnp.asarray(b).astype(jnp.bfloat16) for b in box_out]
    box_f32 = [b.astype(jnp.float32) for b in box_bf]
    det_a, ood_a = generate_detections(
        cls_bf, box_bf, anchors.boxes, C, soft_nms=False,
        ood_method="energy", nms_impl="xla", topk_recall=1.0)
    det_b, ood_b = generate_detections(
        cls_f32, box_f32, anchors.boxes, C, soft_nms=False,
        ood_method="energy", nms_impl="xla", topk_recall=1.0)
    np.testing.assert_allclose(np.asarray(det_a)[..., :4],
                               np.asarray(det_b)[..., :4], atol=1e-2)
    np.testing.assert_array_equal(np.asarray(det_a)[..., 5],
                                  np.asarray(det_b)[..., 5])
    np.testing.assert_allclose(np.asarray(ood_a), np.asarray(ood_b),
                               rtol=2e-2, atol=2e-2)


def test_exact_topk_two_stage_dense_anchor(setup, rng):
    """Stress the two-stage exact top-k (_exact_topk_pairs): ONE anchor
    carrying many of the global top pairs (all C classes hot) must still
    contribute every one of them — the stage-2 anchor filter may not drop
    non-argmax classes of a hot anchor."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-8.0)
    # anchor (2,2,a0) on level 0: ALL C classes hot, descending values
    for c_ in range(C):
        cls_out[0][0, 2, 2, 0 * C + c_] = 9.0 - 0.1 * c_
    # a second hot anchor on level 1 sits between them in value
    cls_out[1][0, 1, 1, 0 * C + 2] = 8.85

    cls_topk, _, indices, classes = post_process(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out],
        num_classes=C, max_detection_points=C + 1, topk_method="exact")
    got = sorted(np.asarray(cls_topk)[0, :, 0], reverse=True)
    want = sorted([9.0 - 0.1 * c_ for c_ in range(C)] + [8.85], reverse=True)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # all C classes of the dense anchor present
    dense = {int(c_) for a, c_ in
             zip(np.asarray(indices)[0], np.asarray(classes)[0])
             if int(a) == int(np.asarray(indices)[0][0])}
    assert dense == set(range(C))
    # values come back descending (reference torch.topk contract)
    np.testing.assert_array_equal(
        np.asarray(cls_topk)[0, :, 0], np.asarray(cls_topk)[0, :, 0][
            np.argsort(-np.asarray(cls_topk)[0, :, 0], kind="stable")])


def test_exact_topk_k_exceeds_anchors(setup, rng):
    """k > num_anchors: stage 2 keeps every anchor and the result is still
    the exact flat top-k."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1)
    n_anchors = sum(c.shape[1] * c.shape[2] * 9 for c in cls_out)
    k = n_anchors + 50
    cls_topk, _, indices, classes = post_process(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(b) for b in box_out],
        num_classes=C, max_detection_points=k, topk_method="exact")
    flat = np.concatenate(
        [c.reshape(1, -1, C) for c in cls_out], 1).reshape(-1)
    ref = np.sort(flat)[::-1][:k]
    np.testing.assert_allclose(
        np.asarray(cls_topk)[0, :, 0], ref, rtol=1e-6)


def test_key_derived_max_logit_msp_match_f32_reduce(setup, rng):
    """The bf16 packed-key path derives max_logit/msp OOD from the
    selection key itself (no second reduce); must equal the f32 path's
    explicit class-axis reduce on bf16-representable logits."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1, bias=-8.0)
    for i in range(30):
        lvl = i % len(cls_out)
        h = cls_out[lvl].shape[1]
        cls_out[lvl][0, (5 * i) % h, (3 * i) % h, i % (9 * C)] = 1.5 + 0.1 * i
    cls_bf = [jnp.asarray(c).astype(jnp.bfloat16) for c in cls_out]
    cls_f32 = [c.astype(jnp.float32) for c in cls_bf]
    box = [jnp.asarray(b) for b in box_out]
    for method in ("max_logit", "msp"):
        det_a, ood_a = generate_detections(
            cls_bf, box, anchors.boxes, C, ood_method=method,
            nms_impl="xla", topk_recall=1.0)
        det_b, ood_b = generate_detections(
            cls_f32, box, anchors.boxes, C, ood_method=method,
            nms_impl="xla", topk_recall=1.0)
        np.testing.assert_array_equal(np.asarray(det_a)[..., 5],
                                      np.asarray(det_b)[..., 5])
        # key round-trips the bf16 logit bits exactly; sigmoid is applied
        # in f32 on both paths -> tight tolerance
        np.testing.assert_allclose(np.asarray(ood_a), np.asarray(ood_b),
                                   rtol=1e-6, atol=1e-6)


def test_unknown_ood_method_raises_all_dtypes(setup, rng):
    """Unknown ood_method must raise at trace time on BOTH the bf16
    packed-key path and the f32 path (the bf16 branch previously fell
    through to msp semantics silently)."""
    cfg, anchors = setup
    cls_out, box_out = _head_outputs(anchors, rng, batch=1)
    box = [jnp.asarray(b) for b in box_out]
    for caster in (jnp.bfloat16, jnp.float32):
        cls = [jnp.asarray(c).astype(caster) for c in cls_out]
        with pytest.raises(ValueError, match="unknown ood_method"):
            generate_detections(cls, box, anchors.boxes, C,
                                ood_method="maxlogit", nms_impl="xla")


def test_min_score_prefilter_is_strict_reference_boundary(setup):
    """The reference pre-filters candidates with scores STRICTLY > 0.01
    (anchors.py:141 `idxs = scores > 0.01`) before NMS. The focal prior
    bias -log((1-0.01)/0.01) initializes every class logit to sigmoid
    ~0.00999999 — just under the cutoff — so a freshly initialized network
    emits ZERO detections, in the reference and here alike. Pin both sides
    of the boundary so the filter can't drift to >= or to a different
    constant (the below-side probe uses sigmoid 0.0099, not the prior's
    one-ulp-under value, to stay backend-robust)."""
    cfg, anchors = setup
    k = min(6, C)            # k <= C: all classes distinct, no NMS merges
    # just-below logit with an explicit one-part-in-1e2 margin (sigmoid
    # 0.0099) rather than the focal prior itself: the prior sits ONE f32
    # ulp under the cutoff, where a backend whose sigmoid rounds up (TPU
    # transcendental approximations) would flip the count
    below_logit = float(np.log(0.0099 / 0.9901))      # sigmoid = 0.0099
    logits = np.full((1, k, 1), below_logit, np.float32)
    logits[0, 0, 0] = -4.5                            # sigmoid 0.0110 > 0.01
    indices = jnp.arange(k)[None, :]
    classes = jnp.arange(k)[None, :]                  # distinct classes
    anchors_sel = jnp.tile(
        jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (k, 1))[None]
    det, _ = batch_detection(
        jnp.asarray(logits), jnp.zeros((1, k, 4), jnp.float32), anchors.boxes,
        indices, classes, max_det_per_image=5, nms_impl="xla",
        anchors_sel=anchors_sel)
    scores = np.asarray(det)[0, :, 4]
    assert (scores > 0).sum() == 1                    # only the -4.5 logit
    np.testing.assert_allclose(scores.max(), jax.nn.sigmoid(-4.5), rtol=1e-6)


def test_inf_coordinate_does_not_poison_class0_nms(setup):
    """A diverged head decoding to an inf coordinate must not produce a
    0*inf = NaN class-0 offset that disables class-0 suppression.

    Plant two identical high-score class-0 boxes (must suppress to one)
    plus one candidate whose regression overflows exp() to inf."""
    cfg, anchors = setup
    k = 8
    boxes_reg = np.zeros((1, k, 4), np.float32)
    boxes_reg[0, 2, 2] = 200.0      # th -> exp overflow -> inf height
    logits = np.full((1, k, 1), -8.0, np.float32)
    logits[0, 0, 0] = 3.0
    logits[0, 1, 0] = 2.9           # overlaps box 0 exactly -> suppressed
    logits[0, 2, 0] = 2.0           # the inf box
    indices = jnp.arange(k)[None, :]
    classes = jnp.zeros((1, k), jnp.int32)
    anchors_sel = jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (k, 1))[None]
    det, _ = batch_detection(
        jnp.asarray(logits), jnp.asarray(boxes_reg), anchors.boxes,
        indices, classes, max_det_per_image=5, nms_impl="xla",
        anchors_sel=anchors_sel)
    det = np.asarray(det)
    assert np.isfinite(det[..., 4]).all()
    # boxes 0 and 1 are identical class-0 boxes: exactly one survives
    top_scores = det[0, :, 4]
    near_3 = np.abs(top_scores - jax.nn.sigmoid(3.0)) < 1e-3
    near_29 = np.abs(top_scores - jax.nn.sigmoid(2.9)) < 1e-3
    assert near_3.sum() == 1 and near_29.sum() == 0
