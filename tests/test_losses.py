import numpy as np
import pytest

from ood_object_detection_tpu.ops.losses import (
    detection_loss_flat,
    detection_loss_levels,
    focal_loss_legacy,
    huber_loss,
    new_focal_loss,
    one_hot,
    sigmoid_bce,
)


def test_sigmoid_bce_matches_formula(rng):
    logits = rng.normal(0, 3, (64,)).astype(np.float32)
    targets = rng.uniform(0, 1, (64,)).astype(np.float32)
    got = np.asarray(sigmoid_bce(logits, targets))
    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    want = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_one_hot_negative_handling():
    x = np.array([2, -1, 0, -2], np.int32)
    oh = np.asarray(one_hot(x, 4))
    np.testing.assert_array_equal(oh[0], [0, 0, 1, 0])
    np.testing.assert_array_equal(oh[1], [0, 0, 0, 0])
    np.testing.assert_array_equal(oh[2], [1, 0, 0, 0])
    np.testing.assert_array_equal(oh[3], [0, 0, 0, 0])


def test_huber_loss_values():
    x = np.array([0.0, 0.5, 2.0], np.float32)
    t = np.zeros(3, np.float32)
    got = float(huber_loss(x, t, delta=1.0, size_average=False))
    # 0 + 0.125 + (0.5 + 1*1) = 1.625
    np.testing.assert_allclose(got, 1.625, rtol=1e-6)


def test_focal_alpha_only_default(rng):
    """Default 'new' focal applies only alpha (reference loss.py:75-95)."""
    logits = rng.normal(0, 2, (16,)).astype(np.float32)
    targets = (rng.uniform(size=16) > 0.5).astype(np.float32)
    loss = np.asarray(new_focal_loss(logits, targets, alpha=0.25, gamma=1.5,
                                     normalizer=1.0, label_smoothing=0.0))
    base = np.asarray(sigmoid_bce(logits, targets))
    alpha_f = targets * 0.25 + (1 - targets) * 0.75
    np.testing.assert_allclose(loss, alpha_f * base, rtol=1e-5)


def test_focal_with_modulation(rng):
    logits = rng.normal(0, 2, (16,)).astype(np.float32)
    targets = (rng.uniform(size=16) > 0.5).astype(np.float32)
    loss = np.asarray(new_focal_loss(logits, targets, alpha=0.25, gamma=2.0,
                                     normalizer=1.0, label_smoothing=0.0,
                                     modulation=True))
    p = 1 / (1 + np.exp(-logits))
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * 0.25 + (1 - targets) * 0.75
    base = np.asarray(sigmoid_bce(logits, targets))
    np.testing.assert_allclose(loss, alpha_f * (1 - p_t) ** 2 * base, rtol=1e-4)


def test_detection_loss_flat_equals_levels(rng):
    """The fused flat loss equals the per-level list API."""
    B, C, A = 2, 5, 9
    shapes = [(8, 8), (4, 4), (2, 2)]
    cls_out, box_out, cls_t, box_t = [], [], [], []
    for h, w in shapes:
        cls_out.append(rng.normal(0, 1, (B, h, w, A * C)).astype(np.float32))
        box_out.append(rng.normal(0, 1, (B, h, w, A * 4)).astype(np.float32))
        cls_t.append(rng.integers(-1, C, (B, h, w, A)).astype(np.int32))
        box_t.append(rng.normal(0, 1, (B, h, w, A * 4)).astype(np.float32))
    num_pos = np.array([3.0, 5.0], np.float32)

    t_lv, c_lv, b_lv = detection_loss_levels(
        cls_out, box_out, cls_t, box_t, num_pos, num_classes=C,
        alpha=0.25, gamma=1.5, delta=0.1, box_loss_weight=50.0)

    flat_cls = np.concatenate([o.reshape(B, -1, C) for o in cls_out], 1)
    flat_box = np.concatenate([o.reshape(B, -1, 4) for o in box_out], 1)
    flat_ct = np.concatenate([t.reshape(B, -1) for t in cls_t], 1)
    flat_bt = np.concatenate([t.reshape(B, -1, 4) for t in box_t], 1)
    t_fl, c_fl, b_fl = detection_loss_flat(
        flat_cls, flat_box, flat_ct, flat_bt, num_pos, num_classes=C,
        alpha=0.25, gamma=1.5, delta=0.1, box_loss_weight=50.0)

    np.testing.assert_allclose(float(t_lv), float(t_fl), rtol=1e-5)
    np.testing.assert_allclose(float(c_lv), float(c_fl), rtol=1e-5)
    np.testing.assert_allclose(float(b_lv), float(b_fl), rtol=1e-5)


def test_parity_vs_reference_loss(rng, reference_path):
    """Exact numeric parity with the reference loss_fn on random tensors."""
    torch = pytest.importorskip("torch")
    from effdet.loss import loss_fn as ref_loss_fn

    B, C, A = 2, 6, 9
    shapes = [(8, 8), (4, 4)]
    cls_out, box_out, cls_t, box_t = [], [], [], []
    for h, w in shapes:
        cls_out.append(rng.normal(0, 1, (B, h, w, A * C)).astype(np.float32))
        box_out.append(rng.normal(0, 1, (B, h, w, A * 4)).astype(np.float32))
        ct = rng.integers(-1, C, (B, h, w, A)).astype(np.int64)
        cls_t.append(ct)
        bt = rng.normal(0, 0.2, (B, h, w, A * 4)).astype(np.float32)
        # reference: box targets of unmatched anchors are exactly 0
        mask = ct < 0
        bt = bt * ~np.repeat(mask, 4, axis=-1)
        box_t.append(bt)
    num_pos = np.array([4.0, 7.0], np.float32)

    alpha, gamma, delta, blw = 0.15, 0.0, 0.1, 50.0

    ref_total, ref_cls, ref_box = ref_loss_fn(
        [torch.from_numpy(np.moveaxis(o, -1, 1).copy()) for o in cls_out],
        [torch.from_numpy(np.moveaxis(o, -1, 1).copy()) for o in box_out],
        [torch.from_numpy(t) for t in cls_t],
        [torch.from_numpy(t) for t in box_t],
        torch.from_numpy(num_pos),
        num_classes=C, alpha=alpha, gamma=gamma, delta=delta,
        box_loss_weight=blw, label_smoothing=0.0, legacy_focal=False)

    t, c, b = detection_loss_levels(
        cls_out, box_out,
        [t.astype(np.int32) for t in cls_t], box_t, num_pos,
        num_classes=C, alpha=alpha, gamma=gamma, delta=delta,
        box_loss_weight=blw)

    np.testing.assert_allclose(float(t), float(ref_total), rtol=1e-4)
    np.testing.assert_allclose(float(c), float(ref_cls), rtol=1e-4)
    np.testing.assert_allclose(float(b), float(ref_box), rtol=1e-4)


def test_parity_vs_reference_legacy_focal(rng, reference_path):
    torch = pytest.importorskip("torch")
    from effdet.loss import focal_loss_legacy as ref_legacy

    logits = rng.normal(0, 2, (4, 8, 8, 45)).astype(np.float32)
    targets = (rng.uniform(size=(4, 8, 8, 45)) > 0.8).astype(np.float32)
    ref = ref_legacy(torch.from_numpy(logits), torch.from_numpy(targets),
                     alpha=0.25, gamma=1.5, normalizer=10.0).numpy()
    mine = np.asarray(focal_loss_legacy(logits, targets, alpha=0.25,
                                        gamma=1.5, normalizer=10.0))
    np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=1e-4)


def test_nhwc_loss_matches_flat(rng):
    """detection_loss_nhwc (per-level, no flat relayout) == the flat API."""
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.losses import (
        detection_loss_flat, detection_loss_nhwc, levels_to_flat)

    b, c, a = 3, 7, 2
    shapes = [(8, 8), (4, 4), (2, 2)]
    cls_out = [jnp.asarray(rng.normal(0, 1, (b, h, w, a * c))
                           .astype(np.float32)) for h, w in shapes]
    box_out = [jnp.asarray(rng.normal(0, 1, (b, h, w, a * 4))
                           .astype(np.float32)) for h, w in shapes]
    a_tot = sum(h * w * a for h, w in shapes)
    cls_t = jnp.asarray(rng.integers(-2, c, (b, a_tot)).astype(np.int32))
    box_t = jnp.asarray(
        np.where(rng.uniform(size=(b, a_tot, 4)) > 0.7,
                 rng.normal(0, 1, (b, a_tot, 4)), 0.0).astype(np.float32))
    num_pos = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))

    kw = dict(num_classes=c, alpha=0.25, gamma=1.5, delta=0.1,
              box_loss_weight=50.0, label_smoothing=0.01)
    t1, c1, b1 = detection_loss_flat(
        levels_to_flat(cls_out, c), levels_to_flat(box_out, 4),
        cls_t, box_t, num_pos, **kw)
    t2, c2, b2 = detection_loss_nhwc(
        cls_out, box_out, cls_t, box_t, num_pos, **kw)
    np.testing.assert_allclose(t1, t2, rtol=2e-5)
    np.testing.assert_allclose(c1, c2, rtol=2e-5)
    np.testing.assert_allclose(b1, b2, rtol=2e-5)

    # legacy focal path too
    kw2 = dict(kw, legacy_focal=True)
    t1, _, _ = detection_loss_flat(
        levels_to_flat(cls_out, c), levels_to_flat(box_out, 4),
        cls_t, box_t, num_pos, **kw2)
    t2, _, _ = detection_loss_nhwc(
        cls_out, box_out, cls_t, box_t, num_pos, **kw2)
    np.testing.assert_allclose(t1, t2, rtol=2e-5)


def test_nhwc_remat_cls_grads_bitwise_equal(rng):
    """remat_cls recomputes the focal chain in bwd — values AND logit
    grads must be bit-identical to the non-remat path (same ops, same
    order, only the residual storage differs)."""
    import jax
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.losses import detection_loss_nhwc

    b, c, a = 2, 7, 2
    shapes = [(8, 8), (4, 4)]
    cls_out = [jnp.asarray(rng.normal(0, 1, (b, h, w, a * c))
                           .astype(np.float32)) for h, w in shapes]
    box_out = [jnp.asarray(rng.normal(0, 1, (b, h, w, a * 4))
                           .astype(np.float32)) for h, w in shapes]
    a_tot = sum(h * w * a for h, w in shapes)
    cls_t = jnp.asarray(rng.integers(-2, c, (b, a_tot)).astype(np.int32))
    box_t = jnp.asarray(
        np.where(rng.uniform(size=(b, a_tot, 4)) > 0.7,
                 rng.normal(0, 1, (b, a_tot, 4)), 0.0).astype(np.float32))
    num_pos = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))
    kw = dict(num_classes=c, alpha=0.25, gamma=1.5, delta=0.1,
              box_loss_weight=50.0, label_smoothing=0.01)

    def total(co, remat):
        return detection_loss_nhwc(co, box_out, cls_t, box_t, num_pos,
                                   remat_cls=remat, **kw)[0]

    v1, g1 = jax.value_and_grad(lambda co: total(co, True))(cls_out)
    v2, g2 = jax.value_and_grad(lambda co: total(co, False))(cls_out)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    for a1, a2 in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_fused_focal_grads_match_flat_oracle(rng):
    """The default (alpha-only) class-loss path runs through
    fused_alpha_focal_sum — a custom-VJP kernel that never materializes
    the one-hot. Its VALUE and logit GRADIENTS must match autodiff of
    the plain one-hot formulation (detection_loss_flat), for both
    alpha-scaled and alpha=None / no-smoothing variants."""
    import jax
    import jax.numpy as jnp
    from ood_object_detection_tpu.ops.losses import (
        detection_loss_flat, detection_loss_nhwc, levels_to_flat)

    b, c, a = 2, 7, 3
    shapes = [(8, 8), (4, 4)]
    cls_out = [jnp.asarray(rng.normal(0, 2, (b, h, w, a * c))
                           .astype(np.float32)) for h, w in shapes]
    box_out = [jnp.asarray(rng.normal(0, 1, (b, h, w, a * 4))
                           .astype(np.float32)) for h, w in shapes]
    a_tot = sum(h * w * a for h, w in shapes)
    cls_t = jnp.asarray(rng.integers(-2, c, (b, a_tot)).astype(np.int32))
    box_t = jnp.asarray(
        np.where(rng.uniform(size=(b, a_tot, 4)) > 0.7,
                 rng.normal(0, 1, (b, a_tot, 4)), 0.0).astype(np.float32))
    num_pos = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))

    for alpha, smooth in ((0.25, 0.01), (None, 0.0)):
        kw = dict(num_classes=c, alpha=alpha, gamma=1.5, delta=0.1,
                  box_loss_weight=50.0, label_smoothing=smooth)

        def f_nhwc(co):
            return detection_loss_nhwc(co, box_out, cls_t, box_t,
                                       num_pos, **kw)[0]

        def f_flat(co):
            return detection_loss_flat(
                levels_to_flat(co, c), levels_to_flat(box_out, 4),
                cls_t, box_t, num_pos, **kw)[0]

        v1, g1 = jax.value_and_grad(f_nhwc)(cls_out)
        v2, g2 = jax.value_and_grad(f_flat)(cls_out)
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)
