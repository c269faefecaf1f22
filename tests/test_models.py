import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.models import (
    EfficientDet,
    create_backbone,
    round_channels,
)


def _tiny_cfg(name="efficientdet_d0", **kw):
    # 1-repeat FPN/heads keep CPU compile time low; structure is unchanged.
    return get_efficientdet_config(name, num_classes=8).replace(
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1, **kw)


@pytest.fixture(scope="module")
def d0():
    """One shared (cfg, model, variables) for the module."""
    cfg = _tiny_cfg()
    model = EfficientDet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, training=False))(jax.random.key(0))
    return cfg, model, vars_


def test_round_channels():
    assert round_channels(32, 1.0) == 32
    assert round_channels(32, 1.1) == 32   # 35.2 snaps to 32 (within 10%)
    assert round_channels(40, 1.1) == 48
    assert round_channels(80, 1.2) == 96
    assert round_channels(112, 1.4) == 160


def test_backbone_feature_channels():
    for name, chans in [
        ("efficientnet_b0", [40, 112, 320]),
        ("efficientnet_b4", [56, 160, 448]),
        ("efficientnet_es", [48, 144, 192]),
        ("resnet50", [512, 1024, 2048]),
    ]:
        _, info = create_backbone(name)
        assert [f["num_chs"] for f in info] == chans, name
        assert [f["reduction"] for f in info] == [8, 16, 32]


def test_backbone_forward_shapes():
    m, info = create_backbone("efficientnet_b0")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(lambda k: m.init(k, x))(jax.random.key(0))
    feats = m.apply(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 40), (1, 4, 4, 112), (1, 2, 2, 320)]


def test_backbone_tf_same_odd_input():
    """TF-SAME padding handles non-power-of-two inputs."""
    m, _ = create_backbone("tf_efficientnet_b0")
    x = jnp.zeros((1, 96, 96, 3))
    vars_ = jax.jit(lambda k: m.init(k, x))(jax.random.key(0))
    feats = m.apply(vars_, x)
    assert feats[0].shape[1:3] == (12, 12)


def test_unknown_backbone_raises():
    with pytest.raises(NotImplementedError):
        create_backbone("not_a_backbone")


def test_efficientdet_full_forward(d0):
    cfg, model, vars_ = d0
    x = jnp.zeros((2, 128, 128, 3))
    cls_out, box_out = jax.jit(
        lambda v, x: model.apply(v, x, training=False))(vars_, x)
    assert len(cls_out) == 5
    assert cls_out[0].shape == (2, 16, 16, 9 * 8)
    assert box_out[0].shape == (2, 16, 16, 36)
    assert cls_out[-1].shape == (2, 1, 1, 72)


def test_efficientdet_staged_forward_matches_full(d0):
    cfg, model, vars_ = d0
    x = jnp.ones((1, 128, 128, 3)) * 0.5
    cls_full, box_full = model.apply(vars_, x, training=False)
    feats = model.apply(vars_, x, training=False,
                        method=EfficientDet.backbone_features)
    activs = model.apply(vars_, feats, training=False,
                         method=EfficientDet.fpn_features)
    cls_st, box_st = model.apply(vars_, activs, training=False,
                                 method=EfficientDet.heads)
    for a, b in zip(cls_full, cls_st):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(box_full, box_st):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_class_head_prior_bias(d0):
    """Class predict bias inits to -log((1-0.01)/0.01) so initial P ~ 0.01."""
    cfg, model, vars_ = d0
    bias = vars_["params"]["class_net"]["predict"]["conv_pw"]["bias"]
    np.testing.assert_allclose(np.asarray(bias), -np.log(99.0), rtol=1e-5)
    box_bias = vars_["params"]["box_net"]["predict"]["conv_pw"]["bias"]
    np.testing.assert_allclose(np.asarray(box_bias), 0.0)


def test_head_ret_activs_and_level_offset(d0):
    cfg, model, vars_ = d0
    x = jnp.zeros((1, 128, 128, 3))
    feats = model.apply(vars_, x, training=False,
                        method=EfficientDet.image_to_fpn)
    out, activs = model.apply(
        vars_, feats, training=False, ret_activs=True, level_offset=1,
        method=EfficientDet.class_head)
    assert len(out) == 4        # levels 1..4
    assert len(activs) == 4
    assert activs[0].shape == (1, 8, 8, cfg.fpn_channels)


def test_batch_stats_updated_in_training(d0):
    cfg, model, vars_ = d0
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 3))
    _, new_state = model.apply(vars_, x, training=True, mutable=["batch_stats"])
    old = jax.tree.leaves(vars_["batch_stats"])
    new = jax.tree.leaves(new_state["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))
    assert changed


def test_fpn_weight_variants():
    """sum variant has no edge weights; qufpn builds and has 21 nodes worth."""
    cfg = _tiny_cfg(fpn_name="bifpn_sum")
    model = EfficientDet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, training=False))(jax.random.key(0))
    flat = jax.tree_util.tree_flatten_with_path(vars_["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("edge_weights" in n for n in names)

    cfg_q = _tiny_cfg(fpn_name="qufpn_fa")
    model_q = EfficientDet(cfg_q)
    vars_q = jax.jit(
        lambda k: model_q.init(k, x, training=False))(jax.random.key(0))
    fnodes = [k for k in vars_q["params"]["fpn"]["cell_0"] if k.startswith("fnode")]
    assert len(fnodes) == 21


def test_all_zoo_backbones_constructible():
    """Every backbone named in the model zoo must build."""
    from ood_object_detection_tpu.config import efficientdet_model_param_dict
    names = {p.get("backbone_name") for p in
             efficientdet_model_param_dict.values()}
    for name in sorted(names):
        m, info = create_backbone(name)
        assert len(info) == 3, name


def test_mixnet_and_csp_feature_channels():
    for name, want in [
        ("mixnet_m", [40, 120, 200]),
        ("mixnet_l", [56, 160, 264]),
        ("cspresnet50", [256, 512, 1024]),
        ("cspresnext50", [512, 1024, 2048]),
        ("cspdarknet53", [256, 512, 1024]),
    ]:
        _, info = create_backbone(name)
        assert [f["num_chs"] for f in info] == want, name


def test_cspresdet50_model_forward():
    cfg = get_efficientdet_config("cspresdet50", num_classes=8).replace(
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1)
    model = EfficientDet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, training=False))(jax.random.key(0))
    cls_out, box_out = model.apply(vars_, x, training=False)
    assert len(cls_out) == 5
    assert cls_out[0].shape == (1, 16, 16, 9 * 8)


@pytest.mark.parametrize("name", [
    "efficientdet_es",        # edge backbone + non-separable heads
    "mobiledetv3_large",      # hard_swish + SE-from-expanded backbone
    "mixdet_m",               # mixed-kernel depthwise backbone
    "tf_efficientdet_lite0",  # TF-SAME padding + relu, no-SE backbone
])
def test_zoo_variant_full_forward(name):
    cfg = get_efficientdet_config(name, num_classes=4).replace(
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1)
    model = EfficientDet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, training=False))(jax.random.key(0))
    cls_out, box_out = model.apply(vars_, x, training=False)
    assert len(cls_out) == cfg.num_levels
    assert cls_out[0].shape[-1] == cfg.num_anchors_per_location * 4


def test_anchor_net_forward_shapes_and_stop_gradient():
    """AnchorNet (reference effdet/efficientdet.py:765-828): per-anchor
    multiplier logits per cell, per-(repeat, level) BN, detached input."""
    from ood_object_detection_tpu.models.anchor_net import AnchorNet

    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(128, 128))
    net = AnchorNet(cfg, num_layers=2, num_channels=16)
    feats = [jnp.ones((1, 128 // 2**lv, 128 // 2**lv, 8))
             for lv in range(3, 8)]
    vars_ = net.init(jax.random.key(0), feats, training=False)
    outs = net.apply(vars_, feats, training=False)
    assert len(outs) == cfg.num_levels
    for lv, o in enumerate(outs):
        s = 128 // 2 ** (lv + 3)
        assert o.shape == (1, s, s, cfg.num_anchors_per_location)

    # detach_input: no gradient flows back into the FPN activations
    def loss(f):
        return sum(jnp.sum(o) for o in net.apply(vars_, f, training=False))
    grads = jax.grad(loss)(feats)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in grads)


def test_drop_path_stochastic_depth():
    """Backbone stochastic depth (reference dropout flag ->
    backbone_args drop_path_rate, pretrain.py:49,94): active only when a
    'drop_path' rng is provided, identical to rate=0 otherwise (BN-freeze
    must not disable it, so it is NOT gated on `training`), different
    block subsets under different rngs, and no new params (checkpoint
    compatibility)."""
    from ood_object_detection_tpu.models.backbone import (
        BACKBONE_DEFS, GenericBackbone)

    d = BACKBONE_DEFS["efficientnet_b0"]
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    plain = GenericBackbone(d)
    dp = GenericBackbone(d, drop_path_rate=0.5)
    vars_ = jax.jit(lambda k: plain.init(k, x, training=False))(
        jax.random.key(0))

    # identical param/batch_stats trees: converted checkpoints load as-is
    vars_dp = jax.jit(lambda k: dp.init(k, x, training=False))(
        jax.random.key(0))
    assert jax.tree.structure(vars_) == jax.tree.structure(vars_dp)

    # no drop_path rng -> bit-identical to the rate=0 module; training
    # False here exercises exactly the BN-frozen-but-drop-path-live case
    base = plain.apply(vars_, x, False)
    off = dp.apply(vars_, x, False)
    for a, b in zip(base, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # with the rng: stochastic (two keys differ) and finite
    outs = [dp.apply(vars_, x, False,
                     rngs={"drop_path": jax.random.key(s)})
            for s in (1, 2)]
    diff = max(float(jnp.abs(a - b).max())
               for a, b in zip(outs[0], outs[1]))
    assert diff > 0.0
    for lvl in outs[0]:
        assert bool(jnp.isfinite(lvl).all())


def test_train_step_with_drop_path():
    """The jitted train step wires the per-step drop_path rng when the
    config asks for stochastic depth; loss/grads stay finite."""
    from ood_object_detection_tpu.config.train_config import (
        default_detection_train_config)
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.train import (
        create_train_state, make_train_step)

    cfg = _tiny_cfg().replace(backbone_args={"drop_path_rate": 0.3})
    model = EfficientDet(cfg)
    anchors = Anchors.from_config(cfg)
    tcfg = default_detection_train_config()
    state, tx = create_train_state(model, tcfg, jax.random.key(0))
    step = make_train_step(model, tx, anchors, tcfg, donate=False)

    rng = np.random.default_rng(3)
    m = 4
    yx = rng.uniform(0, 64, (2, m, 2)).astype(np.float32)
    hw = rng.uniform(8, 32, (2, m, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3))
                             .astype(np.float32)),
        "bbox": jnp.asarray(np.concatenate([yx, yx + hw], -1)),
        "cls": jnp.asarray(rng.integers(1, 8, (2, m)).astype(np.int32)),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(new_state.step) == 1


def test_remat_fpn_heads_grads_match():
    """config.remat_fpn/remat_heads (gradient-checkpointed FPN cells +
    heads, needed for D4@1024-class train memory) change neither the param
    tree nor the training math: loss and per-leaf grads are bit-comparable
    to the un-rematted model."""
    from ood_object_detection_tpu.config.train_config import (
        default_detection_train_config)
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.train import (
        create_train_state, make_train_step)

    rng = np.random.default_rng(11)
    m = 4
    yx = rng.uniform(0, 64, (2, m, 2)).astype(np.float32)
    hw = rng.uniform(8, 32, (2, m, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3))
                             .astype(np.float32)),
        "bbox": jnp.asarray(np.concatenate([yx, yx + hw], -1)),
        "cls": jnp.asarray(rng.integers(1, 8, (2, m)).astype(np.int32)),
    }

    results = {}
    trees = {}
    for fh in (False, True):
        cfg = _tiny_cfg().replace(remat_fpn=fh, remat_heads=fh)
        model = EfficientDet(cfg)
        anchors = Anchors.from_config(cfg)
        tcfg = default_detection_train_config()
        state, tx = create_train_state(model, tcfg, jax.random.key(0))
        step = make_train_step(model, tx, anchors, tcfg, donate=False)
        new_state, metrics = step(state, batch)
        results[fh] = (float(metrics["loss"]), float(metrics["grad_norm"]))
        trees[fh] = jax.tree.structure(state.params)

    # identical param tree (lifted remat must not rename/move leaves)
    assert trees[False] == trees[True]
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results[False][1], results[True][1],
                               rtol=1e-4)
