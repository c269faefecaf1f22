"""separate_head + staged meta-LR schedule (reference infer.py:203-204,
259-274, 560-564, 663, 815-818) and the per-subnet BN freeze flags
(infer.py:323-337): the r4 close-out of the last active-path reference
behaviors.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.meta import (
    MetaConfig,
    MetaTrainer,
    ProjectionNet,
    init_inner_lrs,
    sgd_fast_update,
)
from ood_object_detection_tpu.meta.episode import (
    make_meta_optimizer,
    maml_episode_loss,
)
from ood_object_detection_tpu.models import EfficientDet


# ---------------------------------------------------------------------------
# optimizer grouping / staging (pure optax — no model, no jit)
# ---------------------------------------------------------------------------

def _fake_meta_params():
    """A miniature meta_params tree with one leaf per optimizer group."""
    return {
        "class_net": {
            "conv_rep_0": {"conv_pw": {"kernel": jnp.ones((1, 1, 4, 4)),
                                       "bias": jnp.zeros(4)}},
            "predict": {"conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))},
                        "conv_pw": {"kernel": jnp.ones((1, 1, 4, 9)),
                                    "bias": jnp.zeros(9)}},
            "predict_sep": {"kernel": jnp.ones((1, 1, 4, 9)),
                            "bias": jnp.zeros(9)},
            "bn_rep_0_0": {"scale": jnp.ones(4)},
        },
        "proj": {"dense_0": {"kernel": jnp.ones((4, 4))},
                 "dot_mult": jnp.float32(3.0)},
        "inner_lrs": init_inner_lrs(1, 0.1, multi_inner=True),
    }


def _run_steps(tx, params, n):
    """Apply n all-ones-grad updates; return params after each step."""
    import optax
    state = tx.init(params)
    history = []
    for _ in range(n):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        history.append(params)
    return history


def _moved(before, after, path):
    a, b = before, after
    for k in path:
        a, b = a[k], b[k]
    return not np.allclose(np.asarray(a), np.asarray(b))


def test_meta_groups_separate_head_staging():
    """With separate_head, ONLY the sep head trains from step 0; the rest
    of the class head, the projection net and the inner LRs enable at
    lr_stage_step (reference groups, infer.py:259-274 + 815-818)."""
    cfg = MetaConfig(separate_head=True, learn_inner=True, lr_stage_step=2,
                     meta_lr=0.001)
    p0 = _fake_meta_params()
    hist = _run_steps(make_meta_optimizer(cfg), p0, 3)

    # steps 0-1: staged groups pinned at LR 0
    for step in (0, 1):
        p = hist[step]
        assert _moved(p0, p, ("class_net", "predict_sep", "kernel"))
        assert not _moved(p0, p, ("class_net", "conv_rep_0", "conv_pw",
                                  "kernel"))
        assert not _moved(p0, p, ("class_net", "predict", "conv_pw",
                                  "kernel"))
        assert not _moved(p0, p, ("class_net", "predict", "conv_dw",
                                  "kernel"))
        assert not _moved(p0, p, ("proj", "dense_0", "kernel"))
        assert not _moved(p0, p, ("inner_lrs", "conv"))
    # step 2 (== lr_stage_step): everything enabled
    p = hist[2]
    assert _moved(hist[1], p, ("class_net", "conv_rep_0", "conv_pw",
                               "kernel"))
    assert _moved(hist[1], p, ("class_net", "predict", "conv_pw", "kernel"))
    assert _moved(hist[1], p, ("proj", "dense_0", "kernel"))
    assert _moved(hist[1], p, ("inner_lrs", "conv"))
    assert _moved(hist[1], p, ("inner_lrs", "predict_pw"))


def test_meta_groups_default_staging():
    """Without separate_head: class+proj train from step 0 (reference
    groups 0-2 at meta_lr); the inner LRs stay frozen until lr_stage_step,
    then move (the learn_inner + iter-60 enable, infer.py:280-282,
    815-818)."""
    cfg = MetaConfig(separate_head=False, learn_inner=True, lr_stage_step=2)
    p0 = _fake_meta_params()
    hist = _run_steps(make_meta_optimizer(cfg), p0, 3)

    assert _moved(p0, hist[0], ("class_net", "conv_rep_0", "conv_pw",
                                "kernel"))
    assert _moved(p0, hist[0], ("class_net", "predict", "conv_pw", "kernel"))
    assert _moved(p0, hist[0], ("proj", "dense_0", "kernel"))
    assert not _moved(p0, hist[0], ("inner_lrs", "conv"))
    assert not _moved(p0, hist[1], ("inner_lrs", "conv"))
    assert _moved(hist[1], hist[2], ("inner_lrs", "conv"))


def test_learn_inner_false_freezes_lrs():
    """learn_inner=False == requires_grad False (infer.py:280-282): the
    inner LRs never move, even past the stage step."""
    cfg = MetaConfig(learn_inner=False, lr_stage_step=1)
    p0 = _fake_meta_params()
    hist = _run_steps(make_meta_optimizer(cfg), p0, 3)
    for p in hist:
        assert not _moved(p0, p, ("inner_lrs", "conv"))
        assert not _moved(p0, p, ("inner_lrs", "predict_dw"))


def test_lr_lr_override_constant():
    """An explicit lr_lr trains the inner LRs from step 0 (no staging)."""
    cfg = MetaConfig(learn_inner=True, lr_stage_step=100)
    p0 = _fake_meta_params()
    hist = _run_steps(make_meta_optimizer(cfg, lr_lr=0.5), p0, 1)
    assert _moved(p0, hist[0], ("inner_lrs", "conv"))


# ---------------------------------------------------------------------------
# inner-loop freeze rules (sgd_fast_update path mapping)
# ---------------------------------------------------------------------------

def _class_params():
    return {
        "conv_rep_0": {"conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))},
                       "conv_pw": {"kernel": jnp.ones((1, 1, 4, 4)),
                                   "bias": jnp.zeros(4)}},
        "predict": {"conv_dw": {"kernel": jnp.ones((3, 3, 1, 4))},
                    "conv_pw": {"kernel": jnp.ones((1, 1, 4, 9)),
                                "bias": jnp.zeros(9)}},
        "predict_sep": {"kernel": jnp.ones((1, 1, 4, 9)),
                        "bias": jnp.zeros(9)},
        "bn_rep_0_0": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
    }


def test_fast_update_separate_head_freezes_main_predict_pw():
    """Reference inner freeze rule (infer.py:663): with separate_head the
    MAIN predict pointwise stays frozen; conv reps, the predict depthwise
    and the sep head adapt (sep at learnable_lr[-1] == lrs['predict_pw'])."""
    lrs = init_inner_lrs(1, 0.1, multi_inner=True)
    params = _class_params()
    grads = jax.tree.map(jnp.ones_like, params)
    new = sgd_fast_update(params, grads, lrs, separate_head=True)
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["kernel"]), 1.0)   # frozen
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["bias"]), 0.0)     # frozen
    np.testing.assert_allclose(
        np.asarray(new["predict_sep"]["kernel"]), 0.9)          # adapts
    np.testing.assert_allclose(
        np.asarray(new["predict_sep"]["bias"]), -0.1)           # adapts
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_dw"]["kernel"]), 0.9)   # adapts
    np.testing.assert_allclose(
        np.asarray(new["conv_rep_0"]["conv_pw"]["kernel"]), 0.9)
    np.testing.assert_allclose(np.asarray(new["bn_rep_0_0"]["scale"]), 1.0)


def test_fast_update_only_final_is_pointwise_only():
    """only_final adapts only predict POINTWISE params — the depthwise
    stays frozen ('predict_p' not in 'predict_dw', infer.py:663)."""
    lrs = init_inner_lrs(1, 0.1, multi_inner=True)
    params = _class_params()
    grads = jax.tree.map(jnp.ones_like, params)
    new = sgd_fast_update(params, grads, lrs, only_final=True)
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["kernel"]), 0.9)
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_dw"]["kernel"]), 1.0)   # frozen
    np.testing.assert_allclose(
        np.asarray(new["conv_rep_0"]["conv_dw"]["kernel"]), 1.0)

    # only_final + separate_head: ONLY the sep head adapts
    new = sgd_fast_update(params, grads, lrs, only_final=True,
                          separate_head=True)
    np.testing.assert_allclose(
        np.asarray(new["predict"]["conv_pw"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["predict_sep"]["kernel"]), 0.9)
    changed = [1 for a, b in zip(jax.tree.leaves(params),
                                 jax.tree.leaves(new))
               if not np.allclose(np.asarray(a), np.asarray(b))]
    assert len(changed) == 2    # sep kernel + sep bias only


# ---------------------------------------------------------------------------
# model / end-to-end episode behavior (tiny model)
# ---------------------------------------------------------------------------

def _tiny(separate_head: bool, **meta_kw):
    meta_cfg = MetaConfig(num_sup=2, num_qry=2, num_zero_images=1,
                          img_size=128, qry_img_size=128,
                          meta_batch_size=1, separate_head=separate_head,
                          **meta_kw)
    model_cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=1, image_size=(128, 128),
        separate_head=separate_head).replace(
        fpn_cell_repeats=1, box_class_repeats=1)
    model = EfficientDet(model_cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 128, 128, 3)), training=False))(jax.random.key(0))
    return meta_cfg, model_cfg, model, variables


@pytest.fixture(scope="module")
def tiny_episode():
    """One deterministic synthetic non-val episode at 128/128."""
    from ood_object_detection_tpu.data.episodic import (
        EpisodicDataset, SyntheticEpisodeSource)
    meta_cfg, model_cfg, _, _ = _tiny(False)
    src = SyntheticEpisodeSource(num_cats=4, img_hw=(128, 128))
    cats = [1, 2, 3, 4]
    dataset = EpisodicDataset(src.support_source(cats), src, model_cfg,
                              meta_cfg, train_cats=cats[:3],
                              val_cats=cats[3:], val_freq=10 ** 9)
    import random as _pyrandom
    st = _pyrandom.getstate()
    _pyrandom.seed(0xD15EA5E)
    try:
        for ep in dataset:
            if not ep["val_iter"]:
                break
    finally:
        _pyrandom.setstate(st)
    return dataset.builder.proj_level_sizes, ep


def _proj_params(model_cfg, meta_cfg):
    from ood_object_detection_tpu.meta.projection import POS_DIM
    proj_net = ProjectionNet(fpn_channels=model_cfg.fpn_channels,
                             width=meta_cfg.proj_size,
                             depth=meta_cfg.proj_depth)
    proj_vars = proj_net.init(
        jax.random.key(1), jnp.zeros((1, model_cfg.fpn_channels + 42)))
    proj_params = dict(proj_vars["params"])
    proj_params["dot_mult"] = jnp.float32(meta_cfg.dot_mult)
    proj_params["dot_add"] = jnp.float32(meta_cfg.dot_add)
    return proj_net, proj_params


def test_separate_head_forward_contract():
    """heads='both' returns (sep, main, activs); main equals the default
    heads='main' output; activs are the predict depthwise output (the
    reference's obj_embds, efficientdet.py:685-691)."""
    _, model_cfg, model, variables = _tiny(True)
    x = jax.random.normal(jax.random.key(2), (2, 128, 128, 3))
    feats = model.apply(variables, x, training=False,
                        method=EfficientDet.image_to_fpn)
    sep, main, activs = model.apply(
        variables, feats, training=False, ret_activs=True, level_offset=2,
        force_batch_stats=True, heads="both", method=EfficientDet.class_head)
    main_only, activs2 = model.apply(
        variables, feats, training=False, ret_activs=True, level_offset=2,
        force_batch_stats=True, method=EfficientDet.class_head)
    assert len(sep) == len(main) == len(activs) == 3
    for a, b in zip(main, main_only):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # sep head = 1x1 conv on the SAME depthwise output: manual matmul check
    k = variables["params"]["class_net"]["predict_sep"]["kernel"]
    b = variables["params"]["class_net"]["predict_sep"]["bias"]
    want = jnp.einsum("nhwc,co->nhwo", activs[0], k[0, 0]) + b
    np.testing.assert_allclose(np.asarray(sep[0]), np.asarray(want),
                               atol=1e-5)
    # activs channel count == fpn channels (depthwise stage keeps channels)
    assert activs[0].shape[-1] == model_cfg.fpn_channels
    for a, b in zip(activs, activs2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_separate_head_episode_end_to_end(tiny_episode):
    """A full separate_head meta step: finite loss; before lr_stage_step
    the staged groups (rest of the class head, proj net, inner LRs) hold
    still — the reference's groups 1-3 at LR 0 (infer.py:265-274).

    The sep head's META-gradient is near-zero by the reference's own
    structure (the query forward uses the main head, so fast_sep is
    discarded and only second-order crumbs reach it, infer.py:680-683) —
    its real movement is the INNER loop, covered below.
    """
    lsz, episode = tiny_episode
    meta_cfg, model_cfg, model, variables = _tiny(True, lr_stage_step=2)
    proj_net, proj_params = _proj_params(model_cfg, meta_cfg)
    trainer = MetaTrainer(model, proj_net, variables, meta_cfg, model_cfg,
                          lsz, proj_params=proj_params)
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          trainer.meta_params)
    metrics = trainer.train_episode(episode, phase_a=False)
    assert metrics.get("meta_step")
    assert np.isfinite(float(metrics["final_loss"]))
    after = trainer.meta_params
    cn_b, cn_a = before["class_net"], after["class_net"]
    np.testing.assert_array_equal(
        np.asarray(cn_a["predict"]["conv_pw"]["kernel"]),
        cn_b["predict"]["conv_pw"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(cn_a["conv_rep_0"]["conv_pw"]["kernel"]),
        cn_b["conv_rep_0"]["conv_pw"]["kernel"])
    np.testing.assert_array_equal(np.asarray(after["inner_lrs"]["conv"]),
                                  before["inner_lrs"]["conv"])
    np.testing.assert_array_equal(
        np.asarray(after["proj"]["dense_0"]["kernel"]),
        before["proj"]["dense_0"]["kernel"])


def test_separate_head_inner_adapt_end_to_end(tiny_episode):
    """The inner loop: the sep head and conv reps move, the MAIN predict
    pointwise and BNs do not (reference infer.py:660-678 with the
    separate_head freeze at :663).

    Support activations are synthetic random pyramids rather than the
    untrained model's FPN output: at init the FPN maps are nearly
    spatially constant, which zeroes every conv-KERNEL gradient through
    the batch-stat BNs (bias grads survive) — the freeze semantics being
    tested need activations with spatial structure to show up in f32
    updates at all."""
    from ood_object_detection_tpu.meta.inner_loop import inner_adapt
    from ood_object_detection_tpu.meta import init_inner_lrs as _il
    lsz, episode = tiny_episode
    meta_cfg, model_cfg, model, variables = _tiny(True)
    proj_net, proj_params = _proj_params(model_cfg, meta_cfg)
    s = episode["supp_images"].shape[0]
    keys = jax.random.split(jax.random.key(3), 5)
    supp_activs = [jax.random.normal(k, (s, g, g, model_cfg.fpn_channels))
                   for k, g in zip(keys, (16, 8, 4, 2, 1))]
    lrs = _il(model_cfg.box_class_repeats, meta_cfg.inner_lr)
    fast, metrics = jax.jit(
        lambda v, pp, sa: inner_adapt(model, proj_net, v, pp, lrs, sa,
                                      meta_cfg))(
        variables, proj_params, supp_activs)
    assert np.isfinite(float(metrics["supp_class_loss"]))
    base = variables["params"]["class_net"]
    assert not np.allclose(np.asarray(fast["predict_sep"]["kernel"]),
                           np.asarray(base["predict_sep"]["kernel"]))
    assert not np.allclose(np.asarray(fast["predict_sep"]["bias"]),
                           np.asarray(base["predict_sep"]["bias"]))
    assert not np.allclose(
        np.asarray(fast["conv_rep_0"]["conv_pw"]["kernel"]),
        np.asarray(base["conv_rep_0"]["conv_pw"]["kernel"]))
    assert not np.allclose(np.asarray(fast["predict"]["conv_dw"]["kernel"]),
                           np.asarray(base["predict"]["conv_dw"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(fast["predict"]["conv_pw"]["kernel"]),
        np.asarray(base["predict"]["conv_pw"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(fast["bn_rep_0_2"]["scale"]),
        np.asarray(base["bn_rep_0_2"]["scale"]))


def test_separate_head_config_mismatch_raises(tiny_episode):
    lsz, _ = tiny_episode
    meta_cfg, model_cfg, model, variables = _tiny(False)
    proj_net, proj_params = _proj_params(model_cfg, meta_cfg)
    with pytest.raises(ValueError, match="separate_head"):
        MetaTrainer(model, proj_net, variables,
                    meta_cfg.replace(separate_head=True), model_cfg,
                    lsz, proj_params=proj_params)


def test_freeze_bn_flags_change_episode_loss(tiny_episode):
    """No silent no-op knobs: flipping each freeze_*_bn flag switches that
    subnet's BNs to batch-stat mode (infer.py:323-337) and must change the
    episode loss."""
    lsz, episode = tiny_episode
    meta_cfg, model_cfg, model, variables = _tiny(False)
    proj_net, proj_params = _proj_params(model_cfg, meta_cfg)
    meta_params = {"class_net": variables["params"]["class_net"],
                   "proj": proj_params,
                   "inner_lrs": init_inner_lrs(
                       model_cfg.box_class_repeats, meta_cfg.inner_lr)}

    def loss_for(cfg):
        fn = jax.jit(lambda v, m, b: maml_episode_loss(
            model, proj_net, v, m, b, cfg, model_cfg, lsz)[0])
        return float(fn(variables, meta_params, episode))

    base = loss_for(meta_cfg)
    assert np.isfinite(base)
    for flag in ("freeze_bb_bn", "freeze_fpn_bn", "freeze_box_bn"):
        flipped = loss_for(meta_cfg.replace(**{flag: False}))
        assert np.isfinite(flipped)
        assert flipped != base, f"{flag} is a silent no-op"
