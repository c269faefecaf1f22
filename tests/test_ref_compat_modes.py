"""Reference-exact compat modes for the two remaining meta-path
deviations (PARITY "known deviations" #2/#3):

* ``MetaConfig.ref_pos_enc`` — the reference's interleaved cell
  positional encoding (infer.py:370-371) and feed-row layout
  [feature | anchor | level | cell] (infer.py:377), pinned here by a
  LITERAL torch transcription of the reference's cat/movedim/
  repeat_interleave assembly.
* ``MetaConfig.ref_stale_proj_activs`` — the reference's phase-B
  projection regularizer re-embeds the LAST phase-A episode's
  activations instead of the current episode's proj crops
  (infer.py:349-359: the proj_feats branch is phase-A-only while the
  regularizer keeps running), pinned by behavioral invariance tests.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ood_object_detection_tpu.config import get_efficientdet_config  # noqa: E402
from ood_object_detection_tpu.meta import (  # noqa: E402
    MetaConfig,
    MetaTrainer,
    ProjectionNet,
    build_anchor_features,
)
from ood_object_detection_tpu.meta.projection import (  # noqa: E402
    ANCHOR_ENC,
    CELL_ENC,
    LEVEL_ENC,
    POS_DIM,
)
from ood_object_detection_tpu.models import EfficientDet  # noqa: E402


# ---------------------------------------------------------------------------
# ref_pos_enc: torch-oracle transcription of infer.py:368-377
# ---------------------------------------------------------------------------

def _reference_feed_rows(embds_nchw: np.ndarray, level_idx: int,
                         num_anchs: int = 9) -> np.ndarray:
    """LITERAL transcription of the reference per-level anchor-feature
    assembly (infer.py:368-377), kept statement-for-statement:

        level_embds = level_embds_c.movedim(1,3)
        lev_enc  = proj_net.lev_enc[ix].reshape(1,1,-1)
                       .repeat(B,H,W,1).reshape(-1,6)
        cell_enc = proj_net.cell_enc[:H].reshape(1,H,1,14).repeat(B,1,W,1)
        cell_enc = torch.cat([cell_enc, cell_enc.movedim(1,2)], dim=2)
                       .reshape(-1, 28)
        flat_embds = level_embds.reshape(-1, C)
        anch_enc = proj_net.anch_enc.repeat(flat.shape[0], 1)
        rep_embds = flat_embds.repeat_interleave(num_anchs, dim=0)
        ... torch.cat([rep_embds, anch_enc, lev_enc, cell_enc], dim=1)

    (level_idx stands in for the reference's table index; this
    framework's offset-aligned level indexing is applied by the caller.)
    """
    x = torch.from_numpy(embds_nchw)
    lev_table = torch.from_numpy(LEVEL_ENC)
    cell_table = torch.from_numpy(CELL_ENC)
    anch_table = torch.from_numpy(ANCHOR_ENC)

    level_embds = x.movedim(1, 3)
    b, h, w, c = level_embds.shape
    lev_enc = lev_table[level_idx].reshape(1, 1, -1).repeat(
        b, h, w, 1).reshape(-1, 6)
    cell_enc = cell_table[:h].reshape(1, h, 1, 14).repeat(b, 1, w, 1)
    cell_enc = torch.cat([cell_enc, cell_enc.movedim(1, 2)],
                         dim=2).reshape(-1, 14 * 2)
    flat_embds = level_embds.reshape(-1, c)
    anch_enc = anch_table.repeat(flat_embds.shape[0], 1)
    rep_embds = flat_embds.repeat_interleave(num_anchs, dim=0)
    lev_enc = lev_enc.repeat_interleave(num_anchs, dim=0)
    cell_enc = cell_enc.repeat_interleave(num_anchs, dim=0)
    feed = torch.cat([rep_embds, anch_enc, lev_enc, cell_enc], dim=1)
    return feed.numpy()


@pytest.mark.parametrize("hw,level_offset", [(4, 2), (8, 0), (5, 1)])
def test_ref_pos_enc_matches_reference_transcription(hw, level_offset):
    rng = np.random.default_rng(3)
    b, c = 2, 5
    embds_nchw = rng.normal(0, 1, (b, c, hw, hw)).astype(np.float32)
    embds_nhwc = np.transpose(embds_nchw, (0, 2, 3, 1))

    ours = build_anchor_features(
        [jnp.asarray(embds_nhwc)], level_offset=level_offset,
        ref_pos_enc=True)[0]
    ours = np.asarray(ours).reshape(-1, c + POS_DIM)

    theirs = _reference_feed_rows(embds_nchw, level_idx=level_offset)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_ref_pos_enc_requires_square_maps():
    with pytest.raises(ValueError, match="square"):
        build_anchor_features([jnp.zeros((1, 4, 6, 3))], ref_pos_enc=True)


def test_ref_pos_enc_differs_from_default_but_same_shape():
    """The two modes agree on shape and on the feature block, and differ
    in the positional tail (x-information is genuinely lost for
    left-half cells in ref mode — the deviation being toggled)."""
    rng = np.random.default_rng(4)
    embds = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 3)).astype(np.float32))
    a = np.asarray(build_anchor_features([embds], ref_pos_enc=False)[0])
    b = np.asarray(build_anchor_features([embds], ref_pos_enc=True)[0])
    assert a.shape == b.shape
    np.testing.assert_array_equal(a[..., :3], b[..., :3])  # features
    assert not np.allclose(a[..., 3:], b[..., 3:])
    # ref mode: cells (0,0) and (0,1) (left half of row 0) carry IDENTICAL
    # positional tails — x is not encoded there (infer.py:370-371)
    rows = np.asarray(b).reshape(4, 4, 9, -1)
    np.testing.assert_array_equal(rows[0, 0, 0, 3:], rows[0, 1, 0, 3:])
    # default mode distinguishes them
    rows_d = np.asarray(a).reshape(4, 4, 9, -1)
    assert not np.allclose(rows_d[0, 0, 0, 3:], rows_d[0, 1, 0, 3:])


# ---------------------------------------------------------------------------
# ref_stale_proj_activs: behavioral pinning on a tiny trainer
# ---------------------------------------------------------------------------

def _tiny_trainer(**meta_kw):
    meta_cfg = MetaConfig(num_sup=2, num_qry=2, num_zero_images=1,
                          img_size=128, qry_img_size=128,
                          meta_batch_size=1, proj_reg=0.03, **meta_kw)
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
        jax.random.key(1),
        jnp.zeros((1, model_cfg.fpn_channels + POS_DIM)))
    proj_params = dict(proj_vars["params"])
    proj_params["dot_mult"] = jnp.float32(meta_cfg.dot_mult)
    proj_params["dot_add"] = jnp.float32(meta_cfg.dot_add)
    return meta_cfg, model_cfg, model, proj_net, proj_params, variables


@pytest.fixture(scope="module")
def tiny_episode():
    from ood_object_detection_tpu.data.episodic import (
        EpisodicDataset, SyntheticEpisodeSource)
    meta_cfg, model_cfg, *_ = _tiny_trainer()
    src = SyntheticEpisodeSource(num_cats=4, img_hw=(128, 128))
    cats = [1, 2, 3, 4]
    dataset = EpisodicDataset(src.support_source(cats), src, model_cfg,
                              meta_cfg, train_cats=cats[:3],
                              val_cats=cats[3:], val_freq=10 ** 9)
    import random as _pyrandom
    st = _pyrandom.getstate()
    _pyrandom.seed(0xC0FFEE)
    try:
        for ep in dataset:
            if not ep["val_iter"]:
                break
    finally:
        _pyrandom.setstate(st)
    return dataset.builder.proj_level_sizes, ep


def _make_trainer(lsz, **meta_kw):
    meta_cfg, model_cfg, model, proj_net, proj_params, variables = \
        _tiny_trainer(**meta_kw)
    return MetaTrainer(model, proj_net, variables, meta_cfg, model_cfg,
                       lsz, proj_params=proj_params)


def test_stale_mode_phase_b_ignores_current_proj_images(tiny_episode):
    lsz, ep = tiny_episode
    trainer = _make_trainer(lsz, ref_stale_proj_activs=True)

    # phase B before any phase-A episode: loud error (the reference hits
    # an undefined proj_activs here)
    with pytest.raises(ValueError, match="phase-A"):
        trainer.eval_episode(ep, phase_a=False)

    trainer.eval_episode(ep, phase_a=True)   # captures stale activations

    ep2 = dict(ep)
    ep2["proj_images"] = jnp.asarray(
        np.asarray(ep["proj_images"]) * 0.5 + 0.1)
    m1 = trainer.eval_episode(ep, phase_a=False)
    m2 = trainer.eval_episode(ep2, phase_a=False)
    # the projection regularizer re-embeds the CACHED activations: the
    # current episode's proj pixels cannot move it (reference semantics)
    np.testing.assert_allclose(float(m1["proj_loss"]),
                               float(m2["proj_loss"]), rtol=1e-6)
    # ...and the episode is still sensitive to its NON-proj inputs
    # (sanity that the invariance is specific to the proj input): replace
    # the queries with noise — the query detection loss must move
    rng = np.random.default_rng(11)
    ep3 = dict(ep)
    ep3["qry_images"] = jnp.asarray(rng.normal(
        0, 2, np.asarray(ep["qry_images"]).shape).astype(np.float32))
    m3 = trainer.eval_episode(ep3, phase_a=False)
    # an untrained head's focal loss is nearly flat in its input (prior
    # bias pins sigmoid~0.01) — any genuine movement >> f32 noise proves
    # the path is live; the proj invariance above is the real assertion
    assert abs(float(m1["qry_loss"]) - float(m3["qry_loss"])) > 1e-6


def test_default_mode_phase_b_uses_current_proj_images(tiny_episode):
    lsz, ep = tiny_episode
    trainer = _make_trainer(lsz, ref_stale_proj_activs=False)
    ep2 = dict(ep)
    ep2["proj_images"] = jnp.asarray(
        np.asarray(ep["proj_images"]) * 0.5 + 0.1)
    m1 = trainer.eval_episode(ep, phase_a=False)
    m2 = trainer.eval_episode(ep2, phase_a=False)
    assert not np.isclose(float(m1["proj_loss"]), float(m2["proj_loss"]))


def test_stale_mode_updates_cache_on_later_phase_a(tiny_episode):
    """The cache tracks the LATEST phase-A episode (the reference
    overwrites proj_activs every phase-A iteration)."""
    lsz, ep = tiny_episode
    trainer = _make_trainer(lsz, ref_stale_proj_activs=True)
    trainer.eval_episode(ep, phase_a=True)
    m1 = trainer.eval_episode(ep, phase_a=False)
    # new phase-A episode with different proj crops -> cache changes ->
    # phase-B regularizer changes
    ep2 = dict(ep)
    ep2["proj_images"] = jnp.asarray(
        np.asarray(ep["proj_images"]) * 0.5 + 0.1)
    trainer.eval_episode(ep2, phase_a=True)
    m2 = trainer.eval_episode(ep, phase_a=False)
    assert not np.isclose(float(m1["proj_loss"]), float(m2["proj_loss"]))


def test_stale_mode_rejects_sharded_meta_batch(tiny_episode):
    lsz, ep = tiny_episode
    trainer = _make_trainer(lsz, ref_stale_proj_activs=True)
    from ood_object_detection_tpu.parallel import create_mesh
    mesh = create_mesh((1,), ("episode",))
    with pytest.raises(NotImplementedError, match="stale"):
        trainer.train_meta_batch_sharded([ep], mesh)
