"""Episode assembly: true n-way composition, task_cls alignment, metadata.

Covers the reference MetaEpicDataset semantics (dataloader.py:109-214) and
load_metadata_dicts (preloader.py:153-278, dataloader.py:217-284).

All on-device assertions share ONE episode shape (module fixture) so the
two anchor-labeler jits compile once — distinct batch shapes recompile,
which is expensive on the CI host.
"""
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.data.episodic import (
    EpisodicDataset,
    SyntheticEpisodeSource,
)
from ood_object_detection_tpu.meta.config import MetaConfig

N_WAY, NUM_SUP, NUM_QRY, NUM_ZERO, NUM_CATS = 3, 2, 2, 1, 8


@pytest.fixture(scope="module")
def ds():
    meta_cfg = MetaConfig(
        n_way=N_WAY, num_sup=NUM_SUP, num_qry=NUM_QRY,
        num_zero_images=NUM_ZERO, img_size=128, qry_img_size=128,
        supp_level_offset=2)
    model_cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=1, image_size=(128, 128))
    src = SyntheticEpisodeSource(num_cats=NUM_CATS, img_hw=(128, 128), seed=0)
    cats = list(range(1, NUM_CATS + 1))
    return EpisodicDataset(
        src.support_source(cats), src, model_cfg, meta_cfg,
        train_cats=cats[:5], val_cats=cats[5:], val_freq=0, seed=0)


@pytest.fixture(scope="module")
def episode(ds):
    return ds._episode(val_iter=False)


def test_nway_episode_composition(episode):
    """An n_way=3 episode carries supports/queries/proj crops for ALL
    three categories (reference loops task_cats, dataloader.py:109)."""
    assert episode["supp_images"].shape[0] == N_WAY * NUM_SUP
    assert episode["qry_images"].shape[0] == N_WAY * NUM_QRY + NUM_ZERO
    assert episode["proj_images"].shape[0] == N_WAY * NUM_QRY
    assert len(episode["task_cats"]) == N_WAY
    assert len(set(episode["task_cats"])) == N_WAY

    # one-hot support labels cover every way index (episode is truly
    # 3-way, not 1-way repeated)
    lab = np.asarray(episode["supp_cls_lab"])
    assert lab.shape == (N_WAY * NUM_SUP, N_WAY)
    np.testing.assert_array_equal(lab.sum(axis=1), np.ones(len(lab)))
    assert set(np.argmax(lab, axis=1)) == set(range(N_WAY))
    # NUM_SUP supports per way
    np.testing.assert_array_equal(
        np.sort(lab.sum(axis=0)), [NUM_SUP] * N_WAY)


def test_query_labels_are_binary_over_all_task_cats(episode):
    """Query GT keeps instances of ANY task category, all as class 1
    (reference cat_idxs + np.ones labels, dataloader.py:129-167)."""
    gt_cls = np.asarray(episode["qry_gt_cls"])
    valid = gt_cls > 0
    assert valid.any()
    assert set(np.unique(gt_cls[valid])) == {1}
    # the trailing NUM_ZERO negative images carry no GT
    assert not valid[-NUM_ZERO:].any()


def test_task_cls_aligns_with_proj_anchor_labels(episode):
    """episode['task_cls'] lives in the 0-based anchor-label space: some
    projection anchors of the task category must carry exactly that label
    (this is what the projection objectness target compares against).
    The reference's loop variable leaks — the LAST task category drives
    the projection targets (dataloader.py:126,211)."""
    task_cls = int(episode["task_cls"])
    assert task_cls == episode["task_cats"][-1] - 1
    proj_cls = np.asarray(episode["proj_cls"])
    assert (proj_cls == task_cls).any(), (
        "no projection anchor labeled with the task class — the "
        "objectness/cluster targets would be degenerate")
    # projection anchors see ALL episode categories, not just the task one
    present = set(np.unique(proj_cls[proj_cls >= 0]))
    assert len(present) >= 2


def test_val_episode_uses_val_cats(ds):
    # same (n_way, num_sup, num_qry, num_zero) shape -> labeler jits reused
    ep = ds._episode(val_iter=True)
    assert all(c in ds.val_cats for c in ep["task_cats"])


def test_metadata_loader(tmp_path):
    (tmp_path / "LVIS").mkdir()
    (tmp_path / "LVIS" / "cats.csv").write_text(
        "name,image_count\n"
        "cat_a,50\ncat_b,40\ncat_c,30\ncat_d,20\ncat_e,10\n")
    # images: i1 (a), i2 (a+d), i3 (b), i4 (d), i5 (e)
    (tmp_path / "LVIS" / "annots.txt").write_text(
        "i1;['cat_a'];[[0,0,10,10]]\n"
        "i2;['cat_a','cat_d'];[[0,0,10,10],[5,5,15,15]]\n"
        "i3;['cat_b'];[[1,1,9,9]]\n"
        "i4;['cat_d'];[[2,2,8,8]]\n"
        "i5;['cat_e'];[[3,3,7,7]]\n")
    (tmp_path / "LVIS" / "sample.txt").write_text(
        "cat_a;['i1','i2']\n"
        "cat_b;['i3']\n"
        "cat_d;['i2','i4']\n"
        "cat_e;['i5']\n")

    from ood_object_detection_tpu.data.metadata import (
        build_category_pools,
        load_annotation_index,
        load_category_counts,
        split_train_val_cats,
    )

    counts = load_category_counts(str(tmp_path / "LVIS" / "cats.csv"))
    assert counts == {"cat_a": 50, "cat_b": 40, "cat_c": 30,
                      "cat_d": 20, "cat_e": 10}

    train, val = split_train_val_cats(counts, num_train=2, num_val=2)
    # top-2 by count train; next 2 below them validate
    assert set(train) == {"cat_a", "cat_b"}
    assert set(val) == {"cat_c", "cat_d"}

    img_cats, img_bboxes = load_annotation_index(
        str(tmp_path / "LVIS" / "annots.txt"))
    assert img_cats["i2"] == ["cat_a", "cat_d"]
    assert img_bboxes["i2"] == [[0, 0, 10, 10], [5, 5, 15, 15]]

    pools = build_category_pools(
        str(tmp_path / "LVIS" / "sample.txt"), img_cats, train, val)
    # i2 contains val category cat_d -> dropped from TRAIN cat_a's pool
    # (reference de-overlap, preloader.py:222-237); kept for val cat_d
    assert pools["cat_a"] == ["i1"]
    assert sorted(pools["cat_d"]) == ["i2", "i4"]
    assert "cat_e" not in pools  # not in either split


def test_directory_support_source(tmp_path):
    from PIL import Image

    from ood_object_detection_tpu.data.metadata import (
        directory_support_source,
    )

    d = tmp_path / "hot dog"
    d.mkdir()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(d / "a.png")
    Image.new("RGB", (8, 8), (0, 255, 0)).save(d / "b.png")

    src = directory_support_source(str(tmp_path), {7: "hot_dog"})
    assert len(src[7]) == 2
    img = src[7][0]()
    assert img.size == (8, 8)


def test_episode_prefetcher_preserves_order_and_terminates():
    from ood_object_detection_tpu.data.episodic import EpisodePrefetcher

    items = [{"i": i} for i in range(7)]
    out = list(EpisodePrefetcher(items, depth=2))
    assert out == items

    # early consumer exit must not hang the producer thread
    import itertools
    inf = ({"i": i} for i in itertools.count())
    got = []
    for ep in EpisodePrefetcher(inf, depth=2):
        got.append(ep["i"])
        if len(got) >= 5:
            break
    assert got == list(range(5))


def test_episode_prefetcher_propagates_producer_errors():
    """A failing episode source must raise in the consumer, not look
    like a clean end-of-stream (silent training truncation)."""
    from ood_object_detection_tpu.data.episodic import EpisodePrefetcher

    def bad_source():
        yield {"i": 0}
        raise RuntimeError("decode failed")

    import pytest as _pytest
    got = []
    with _pytest.raises(RuntimeError, match="decode failed"):
        for ep in EpisodePrefetcher(bad_source(), depth=2):
            got.append(ep["i"])
    assert got == [0]


def test_random_trans_supp_aug_toggles():
    """Reference defaults letterbox both queries and supports; jitter+flip
    only behind random_trans / supp_aug (dataloader.py:58-61,114-115)."""
    from ood_object_detection_tpu.config import get_efficientdet_config
    from ood_object_detection_tpu.data.episodic import (
        EpisodicDataset, SyntheticEpisodeSource)
    from ood_object_detection_tpu.meta import MetaConfig

    model_cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=1, image_size=(128, 128))

    def make(**kw):
        m = MetaConfig(num_sup=1, num_qry=1, num_zero_images=0,
                       img_size=128, qry_img_size=128, **kw)
        src = SyntheticEpisodeSource(num_cats=3, img_hw=(128, 128))
        return EpisodicDataset(src.support_source([1, 2, 3]), src,
                               model_cfg, m, train_cats=[1, 2],
                               val_cats=[3], val_freq=10 ** 9)

    ds = make()                       # reference defaults: both off
    assert ds.qry_tf_train is ds.qry_tf_eval
    assert ds.supp_tf_train is ds.supp_tf_eval

    ds_aug = make(random_trans=True, supp_aug=True)
    assert ds_aug.qry_tf_train is not ds_aug.qry_tf_eval
    assert ds_aug.supp_tf_train is not ds_aug.supp_tf_eval
    # supp_aug uses the reference's (0.8, 1.5) jitter range
    rrp = ds_aug.supp_tf_train.transforms[1]
    assert tuple(rrp.scale) == (0.8, 1.5)
    # augmented episodes still assemble and carry the fixed shapes
    ep = next(iter(ds_aug))
    assert ep["qry_images"].shape[1:] == (128, 128, 3)
