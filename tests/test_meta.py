import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.meta import (
    ANCHOR_ENC,
    CELL_ENC,
    LEVEL_ENC,
    MetaConfig,
    ProjectionNet,
    build_anchor_features,
    cluster_pseudo_targets,
    confidence_topk,
    cosine_hinge_loss,
    init_inner_lrs,
    sgd_fast_update,
)


def test_positional_encoding_shapes_and_values():
    assert ANCHOR_ENC.shape == (9, 8)
    assert CELL_ENC.shape == (80, 14)
    assert LEVEL_ENC.shape == (5, 6)
    # first anchor: loc = -pi, features sin(-pi)=0-ish, cos(-pi)=-1
    np.testing.assert_allclose(ANCHOR_ENC[0, 0], np.sin(-np.pi), atol=1e-6)
    np.testing.assert_allclose(ANCHOR_ENC[0, 1], np.cos(-np.pi), atol=1e-6)


def test_build_anchor_features_shapes():
    levels = [jnp.zeros((2, 8, 8, 64)), jnp.zeros((2, 4, 4, 64))]
    feats = build_anchor_features(levels, level_offset=1)
    assert feats[0].shape == (2, 8 * 8 * 9, 64 + 42)
    assert feats[1].shape == (2, 4 * 4 * 9, 64 + 42)


def test_confidence_topk_static():
    conf = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 640)))
    idx, vals = confidence_topk(conf, 0.125)
    assert idx.shape == (3, 80)
    # top-k really are the largest
    ref = np.sort(np.asarray(conf), axis=1)[:, -80:]
    np.testing.assert_allclose(np.sort(np.asarray(vals), axis=1), ref,
                               rtol=1e-6)


def test_confidence_topk_keep_all_small_levels():
    conf = jnp.zeros((2, 36))
    idx, vals = confidence_topk(conf, 0.125, min_keep_all=36)
    assert idx.shape == (2, 36)


def test_projection_net_output_width():
    net = ProjectionNet(fpn_channels=64, width=128, depth=3)
    x = jnp.zeros((10, 64 + 42))
    params = net.init(jax.random.key(0), x)
    out = net.apply(params, x)
    assert out.shape == (10, 64)
    # bias-free dense layers
    for layer in params["params"].values():
        assert "bias" not in layer


def test_cosine_hinge_loss():
    inputs = jnp.asarray([0.9, 0.2, -0.5])
    targets = jnp.asarray([1.0, -1.0, -1.0])
    # losses: 1-0.9=0.1; 0.2-0=0.2; clip(-0.5)=0
    loss = float(cosine_hinge_loss(inputs, targets))
    np.testing.assert_allclose(loss, (0.1 + 0.2 + 0.0) / 3, rtol=1e-5)


def test_cluster_pseudo_targets_separates_cluster():
    """Anchors of the task class share an embedding direction; champion
    selection should find them and give them higher targets."""
    rng = np.random.default_rng(0)
    S, K, D = 4, 16, 8
    base = rng.normal(0, 1, D)
    embds = rng.normal(0, 1, (S, K, D)).astype(np.float32)
    task_slots = np.zeros((S, K), bool)
    task_slots[:, :3] = True     # first 3 anchors of each image = task object
    embds[task_slots] = base + rng.normal(0, 0.05, (task_slots.sum(), D))
    confs = np.where(task_slots, 3.0, -3.0).astype(np.float32)

    res = cluster_pseudo_targets(
        jnp.asarray(embds), jnp.asarray(confs),
        jnp.float32(3.0), jnp.float32(3.0),
        sim_thresh=0.2, refine_reduce="sum", sim_target="max")

    target = np.asarray(res.target).reshape(S, K)
    assert float(res.valid_count) >= 3
    # champions are task anchors
    champs = np.asarray(res.champion_idx)
    assert all((c % K) < 3 for c in champs)
    assert target[task_slots].mean() > 3 * target[~task_slots].mean()


def test_inner_lrs_and_fast_update():
    lrs = init_inner_lrs(3, 0.1, multi_inner=True)
    assert lrs["conv"].shape == (3,)
    params = {
        "conv_rep_0": {"conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))}},
        "predict": {"conv_pw": {"kernel": jnp.ones((1, 1, 4, 4)),
                                "bias": jnp.zeros(4)},
                    "conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))}},
        "bn_rep_0_0": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    new = sgd_fast_update(params, grads, lrs)
    # conv_rep_0 updated with lr 0.1
    np.testing.assert_allclose(
        np.asarray(new["conv_rep_0"]["conv_dw"]["kernel"]), 0.9)
    # predict pw updated
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["kernel"]), 0.9)
    # bn untouched
    np.testing.assert_allclose(np.asarray(new["bn_rep_0_0"]["scale"]), 1.0)


def test_only_final_updates_predict_only():
    lrs = init_inner_lrs(3, 0.1, multi_inner=True)
    params = {
        "conv_rep_0": {"conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))}},
        "predict": {"conv_pw": {"kernel": jnp.ones((1, 1, 4, 4))}},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    new = sgd_fast_update(params, grads, lrs, only_final=True)
    np.testing.assert_allclose(
        np.asarray(new["conv_rep_0"]["conv_dw"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["kernel"]), 0.9)


def test_weighted_median():
    from ood_object_detection_tpu.meta import weighted_median
    embds = jnp.asarray([[1.0], [5.0], [3.0], [100.0]])
    confs = jnp.asarray([1.0, 1.0, 1.0, 0.01])
    median, conf_sum = weighted_median(embds, confs)
    # cumulative weight crosses half (1.505) at the 2nd sorted element (3.0)
    np.testing.assert_allclose(np.asarray(median), [[3.0]])
    np.testing.assert_allclose(float(conf_sum), 3.01)


def test_cluster_factorized_matches_naive_matrix():
    """The factorized clustering (no [M,M] buffer) must reproduce the
    naive full-similarity-matrix computation: same champions, targets,
    coherence, and champion similarities (f32 association tolerance)."""
    rng = np.random.default_rng(3)
    S, K, D = 5, 7, 6
    M = S * K
    embds = rng.normal(0, 1, (S, K, D)).astype(np.float32)
    confs = rng.normal(0, 2, (S, K)).astype(np.float32)
    dot_mult, dot_add = 3.0, 1.0
    sim_thresh = 0.15

    res = cluster_pseudo_targets(
        jnp.asarray(embds), jnp.asarray(confs),
        jnp.float32(dot_mult), jnp.float32(dot_add),
        sim_thresh=sim_thresh, refine_reduce="sum", sim_target="max")

    # naive numpy reference: full [M, M] similarity matrix
    e = embds.reshape(M, D)
    e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    sim = e @ e.T
    t = 1.0 / (1.0 + np.exp(-(dot_mult * (confs.reshape(M) + dot_add))))
    weighted = (t[:, None] * t[None, :] * sim).reshape(S, K, M)
    champ0 = np.arange(S) * K + np.argmax(weighted.mean(2), axis=1)
    avg_init = sim[champ0][:, champ0].mean(1) - 1.0 / S
    valid = (avg_init > sim_thresh).astype(np.float32)
    denom = max(valid.sum(), 1.0)
    w_champ = weighted[:, :, champ0] * valid[None, None, :]
    champs = np.arange(S) * K + np.argmax(w_champ.sum(2), axis=1)
    target_clust_all = (sim[:, champ0] * valid[None, :]).sum(1) / denom
    champ_sims = sim[:, champs]
    all_max, all_arg = champ_sims.max(1), champ_sims.argmax(1)
    target = t * target_clust_all[champs][all_arg] * all_max
    coherence = sim[champs][:, champs].mean(1) - 1.0 / S

    np.testing.assert_array_equal(np.asarray(res.champion_idx), champs)
    np.testing.assert_allclose(np.asarray(res.champ_sims), champ_sims,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.target), target,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.champion_coherence), coherence,
                               rtol=1e-5, atol=1e-6)
    assert float(res.valid_count) == valid.sum()


def test_proj_phase_level_alignment():
    """The phase-A projection loss must pair the head's TOP levels with
    the offset proj labeler's levels (grids 8/4/2 at a 256 crop match
    levels 5-7) — select_confident_anchors enforces it loudly, and the
    selected label count equals the selected anchor count."""
    import jax.numpy as jnp
    from ood_object_detection_tpu.meta.projection import (
        select_confident_anchors)
    from ood_object_detection_tpu.meta import MetaConfig

    m = MetaConfig(conf_keep_frac=0.125, min_level_cells=4)
    # three aligned levels: grids 8/4/2, 9 anchors/cell
    feats = [jnp.zeros((2, g * g * 9, 7)) for g in (8, 4, 2)]
    cls_out = [jnp.zeros((2, g, g, 9)) for g in (8, 4, 2)]
    sizes = [g * g * 9 for g in (8, 4, 2)]
    labels = jnp.zeros((2, sum(sizes)), jnp.int32)
    rows, confs, labs, _ = select_confident_anchors(
        feats, cls_out, m, labels_flat=labels, level_sizes=sizes)
    assert rows.shape[1] == confs.shape[1] == labs.shape[1]

    # misalignment (5 head levels vs 3 label levels) fails loudly instead
    # of silently gathering clamped labels (the pre-fix failure mode)
    feats5 = [jnp.zeros((2, g * g * 9, 7)) for g in (32, 16, 8, 4, 2)]
    cls5 = [jnp.zeros((2, g, g, 9)) for g in (32, 16, 8, 4, 2)]
    with pytest.raises(ValueError, match="level mismatch"):
        select_confident_anchors(feats5, cls5, m, labels_flat=labels,
                                 level_sizes=sizes)

    # aligned level COUNT but wrong grids also fails loudly
    with pytest.raises(ValueError, match="misaligned"):
        select_confident_anchors(feats5[:3], cls5[:3], m,
                                 labels_flat=labels, level_sizes=sizes)
