"""SPMD meta-batch step == the reference's sequential episode
accumulation (infer.py:796-809), computed in parallel over a mesh axis.
"""
import numpy as np
import pytest


def _make_trainer_and_episodes(n_episodes=4):
    import jax
    import jax.numpy as jnp

    from ood_object_detection_tpu.config import get_efficientdet_config
    from ood_object_detection_tpu.data.episodic import (
        EpisodicDataset, SyntheticEpisodeSource)
    from ood_object_detection_tpu.meta import (
        MetaConfig, MetaTrainer, ProjectionNet)
    from ood_object_detection_tpu.meta.projection import POS_DIM
    from ood_object_detection_tpu.models import EfficientDet

    meta_cfg = MetaConfig(num_sup=2, num_qry=2, num_zero_images=1,
                          img_size=128, qry_img_size=128,
                          meta_batch_size=n_episodes)
    model_cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=1, image_size=(128, 128)).replace(
        fpn_cell_repeats=1, box_class_repeats=1)
    model = EfficientDet(model_cfg)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 128, 128, 3)), training=False))(jax.random.key(0))
    proj_net = ProjectionNet(fpn_channels=model_cfg.fpn_channels,
                             width=meta_cfg.proj_size,
                             depth=meta_cfg.proj_depth)
    proj_vars = proj_net.init(
        jax.random.key(1), jnp.zeros((1, model_cfg.fpn_channels + POS_DIM)))
    proj_params = dict(proj_vars["params"])
    proj_params["dot_mult"] = jnp.float32(meta_cfg.dot_mult)
    proj_params["dot_add"] = jnp.float32(meta_cfg.dot_add)

    src = SyntheticEpisodeSource(num_cats=4, img_hw=(128, 128))
    cats = [1, 2, 3, 4]
    dataset = EpisodicDataset(src.support_source(cats), src, model_cfg,
                              meta_cfg, train_cats=cats[:3],
                              val_cats=cats[3:], val_freq=10 ** 9)
    # Pin the GLOBAL random state for episode assembly: the projection
    # transforms draw from the module-level `random`, so in-suite test
    # ordering otherwise changes the episodes. The episode loss contains
    # discrete selections (clustering champion argmax, top-k confidence
    # masks) that sit arbitrarily close to ties for some draws — there,
    # the sequential and shard_map lowerings' different f32 rounding can
    # flip a selection and produce different-but-equally-valid meta-grads.
    # Fixed episodes make the equivalence check deterministic.
    import random as _pyrandom
    st = _pyrandom.getstate()
    _pyrandom.seed(0x0E150DE)
    try:
        it = iter(dataset)
        episodes = []
        while len(episodes) < n_episodes:
            ep = next(it)
            if not ep["val_iter"]:
                episodes.append(ep)
    finally:
        _pyrandom.setstate(st)

    def build():
        import optax
        t = MetaTrainer(model, proj_net, variables, meta_cfg, model_cfg,
                        dataset.builder.proj_level_sizes,
                        proj_params={k: v for k, v in proj_params.items()})
        # plain SGD for the equivalence tests: params then differ
        # LINEARLY with the accumulated grads, so tight allclose is a
        # valid check. (Adam's first step is ~ lr*sign(grad) — near-zero
        # gradient components flip sign under f32 summation-order
        # changes, making post-adam params uninformative.)
        t.tx = optax.sgd(0.01)
        t.opt_state = t.tx.init(t.meta_params)
        t._build_steps()
        return t
    return build, episodes





def _snapshot(tree):
    import jax
    return [np.asarray(l).copy() for l in jax.tree.leaves(tree)]


def _assert_updates_equivalent(init_leaves, tree_a, tree_b, rel=2e-3):
    """The two trainers' UPDATES (params - init) must agree in relative
    L2 over the whole flattened update vector. Per-leaf allclose flaked:
    sequential accumulation vs the vmapped mesh sum reassociate the f32
    episode-grad adds, and near-cancelling components then miss any
    blanket per-element tolerance while the update as a whole is equal."""
    import jax
    da = np.concatenate([np.ravel(np.asarray(a) - i) for i, a in
                         zip(init_leaves, jax.tree.leaves(tree_a))])
    db = np.concatenate([np.ravel(np.asarray(b) - i) for i, b in
                         zip(init_leaves, jax.tree.leaves(tree_b))])
    na = float(np.linalg.norm(da))
    assert na > 0.0, "no update applied"
    err = float(np.linalg.norm(da - db)) / na
    assert err < rel, f"relative L2 update mismatch {err:.2e}"


def test_sharded_meta_step_matches_sequential_accumulation():
    import jax
    from ood_object_detection_tpu.parallel import create_mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")

    build, episodes = _make_trainer_and_episodes(4)

    seq = build()
    init = _snapshot(seq.meta_params)
    for ep in episodes:
        metrics = seq.train_episode(ep, phase_a=False)
    assert metrics.get("meta_step"), "sequential meta-batch did not step"

    shard = build()
    mesh = create_mesh((4,), ("episode",))
    m = shard.train_meta_batch_sharded(episodes, mesh, axis="episode")
    assert np.isfinite(float(m["final_loss"]))

    _assert_updates_equivalent(init, seq.meta_params, shard.meta_params)


def test_sharded_meta_step_local_chunking():
    """meta_batch_size > mesh size: each device loops its local chunk."""
    import jax
    from ood_object_detection_tpu.parallel import create_mesh

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")

    build, episodes = _make_trainer_and_episodes(4)

    seq = build()
    init = _snapshot(seq.meta_params)
    for ep in episodes:
        seq.train_episode(ep, phase_a=False)

    shard = build()
    mesh = create_mesh((2,), ("episode",))
    shard.train_meta_batch_sharded(episodes, mesh, axis="episode")

    _assert_updates_equivalent(init, seq.meta_params, shard.meta_params)


def test_meta_cli_episode_mesh_smoke(tmp_path, capsys):
    """Driver end-to-end with --episode-mesh: SPMD meta-batches."""
    import jax
    import json as _json
    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    from ood_object_detection_tpu.meta import train_driver

    train_driver.main([
        "--model", "efficientdet_d0",
        "--img-size", "128", "--qry-img-size", "128",
        "--fpn-repeats", "1", "--head-repeats", "1",
        "--n-way", "2", "--num-sup", "2", "--num-qry", "2",
        "--num-zero-images", "1", "--meta-batch-size", "2",
        "--episode-mesh", "2",
        "--proj-iters", "1", "--total-iters", "5", "--val-freq", "100",
        "--log-freq", "2", "--synthetic-cats", "4",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--per-cat-dir", str(tmp_path / "pc"),
    ])
    out = capsys.readouterr().out
    logs = [_json.loads(l) for l in out.splitlines()
            if l.startswith("{")]
    assert logs and "final_iter" in logs[-1]
    train_logs = [l for l in logs if "final_loss" in l]
    assert train_logs, "sharded meta-batches logged no train metrics"
    assert all(np.isfinite(l["final_loss"]) for l in train_logs)
