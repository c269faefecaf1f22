import numpy as np
import pytest

from ood_object_detection_tpu.data import (
    PretrainEpisodeStream,
    SyntheticEpisodeSource,
    split_categories_by_count,
)


def test_split_categories_by_count():
    counts = {1: 100, 2: 5, 3: 50, 4: 20}
    train, val = split_categories_by_count(counts, 2, 2)
    assert train == [1, 3]
    assert val == [4, 2]


def test_stream_yields_fixed_shape_batches():
    src = SyntheticEpisodeSource(num_cats=4, img_hw=(64, 64))
    stream = PretrainEpisodeStream(
        src, (64, 64), train_cats=[1, 2, 3], val_cats=[4],
        num_qry=4, val_freq=3, num_val_batches=1)
    it = iter(stream)
    batches = [next(it) for _ in range(6)]
    for b in batches:
        assert b["image"].shape == (4, 64, 64, 3)
        assert b["bbox"].shape == (4, 100, 4)
        assert b["cls"].shape == (4, 100)
    # val block interleaved at step 3
    val_flags = [b["val_iter"] for b in batches]
    assert any(val_flags) and not all(val_flags)


def test_stream_train_val_categories_disjoint():
    src = SyntheticEpisodeSource(num_cats=4, img_hw=(64, 64))
    stream = PretrainEpisodeStream(
        src, (64, 64), train_cats=[1, 2], val_cats=[3, 4],
        num_qry=4, val_freq=2, num_val_batches=1)
    it = iter(stream)
    for _ in range(8):
        b = next(it)
        cats = set(np.unique(b["cls"][b["cls"] > 0]))
        if b["val_iter"]:
            assert cats <= {3, 4}, cats
        else:
            assert cats <= {1, 2}, cats


def test_random_trans_default_letterboxes_train_items():
    """preloader.py:71-76: train items use the EVAL letterbox unless
    random_trans; the flag swaps in jitter+flip."""
    from ood_object_detection_tpu.data.pretrain_stream import (
        PretrainEpisodeStream)
    from ood_object_detection_tpu.data import SyntheticEpisodeSource

    src = SyntheticEpisodeSource(num_cats=3, img_hw=(64, 64))
    stream = PretrainEpisodeStream(src, (64, 64), [1, 2], [3], num_qry=2)
    assert stream.train_tf is stream.eval_tf
    aug = PretrainEpisodeStream(src, (64, 64), [1, 2], [3], num_qry=2,
                                random_trans=True)
    assert aug.train_tf is not aug.eval_tf
    batch = next(iter(aug))
    assert batch["image"].shape == (2, 64, 64, 3)
