"""Pallas fused anchor-labeling kernel parity vs the vmapped XLA path.

The kernel (ops/pallas_labeler.py) must reproduce ops/target_assigner's
match codes and targets bit-for-bit — same IoU formula, same -1/-2
conventions, same argmax-first and lowest-row-claims tie-breaks
(reference ArgMaxMatcher, argmax_matcher.py:105-160).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.ops.anchors import Anchors
from ood_object_detection_tpu.ops.pallas_labeler import (
    pallas_batch_match,
    pallas_label_match,
)
from ood_object_detection_tpu.ops.target_assigner import batch_label_anchors


@pytest.fixture(scope="module")
def anchors():
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(128, 128))
    return jnp.asarray(Anchors.from_config(cfg).boxes)     # [3069, 4]


def _random_batch(rng, b, m, img=128):
    yx = rng.uniform(0, img - 40, (b, m, 2)).astype(np.float32)
    hw = rng.uniform(8, 40, (b, m, 2)).astype(np.float32)
    boxes = np.concatenate([yx, yx + hw], -1)
    cls = rng.integers(1, 4, (b, m)).astype(np.int32)
    # pad/invalidate a varying suffix per image
    for i in range(b):
        k = rng.integers(0, m)
        cls[i, m - k:] = -1
    return jnp.asarray(boxes), jnp.asarray(cls)


def test_label_result_parity(anchors, rng):
    boxes, cls = _random_batch(rng, b=4, m=12)
    ref = batch_label_anchors(anchors, boxes, cls, impl="xla")
    out = batch_label_anchors(anchors, boxes, cls, impl="pallas")
    np.testing.assert_array_equal(np.asarray(out.matches),
                                  np.asarray(ref.matches))
    np.testing.assert_array_equal(np.asarray(out.cls_targets),
                                  np.asarray(ref.cls_targets))
    # box encode runs inside the kernel; Mosaic's div/log may differ from
    # XLA's by ulps
    np.testing.assert_allclose(np.asarray(out.box_targets),
                               np.asarray(ref.box_targets),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.num_positives),
                                  np.asarray(ref.num_positives))


def test_all_invalid_image(anchors):
    boxes = jnp.zeros((2, 8, 4), jnp.float32)
    cls = jnp.full((2, 8), -1, jnp.int32)
    out = batch_label_anchors(anchors, boxes, cls, impl="pallas")
    assert (np.asarray(out.matches) == -1).all()
    assert (np.asarray(out.num_positives) == 0).all()


def test_force_match_lowest_row_wins(anchors):
    """Two identical GT boxes claim the same best anchor: row 0 wins
    (the reference's lowest-row tie-break)."""
    box = np.array([20.0, 20.0, 50.0, 50.0], np.float32)
    boxes = jnp.asarray(np.tile(box, (1, 2, 1)))
    cls = jnp.asarray([[1, 2]], jnp.int32)
    ref = batch_label_anchors(anchors, boxes, cls, impl="xla")
    out = batch_label_anchors(anchors, boxes, cls, impl="pallas")
    np.testing.assert_array_equal(np.asarray(out.matches),
                                  np.asarray(ref.matches))
    # the claimed anchor belongs to row 0
    claimed = np.asarray(out.matches)[0]
    assert (claimed >= 0).any()
    assert 0 in claimed[claimed >= 0]


def test_multiblock_row_argmax(anchors, rng):
    """block_t smaller than A exercises the cross-block row-max combine:
    best_anchor_per_row must equal the global argmax (first max wins)."""
    boxes, cls = _random_batch(rng, b=3, m=10)
    valid = cls > -1
    _, _, best = pallas_batch_match(anchors, boxes, valid, block_t=512)

    from ood_object_detection_tpu.ops.boxes import pairwise_iou_yxyx

    def ref_best(bb, vv):
        sim = pairwise_iou_yxyx(bb, anchors)
        sim = jnp.where(vv[:, None], sim, -1.0)
        return jnp.argmax(sim, axis=1)
    expect = jax.vmap(ref_best)(boxes, valid)
    np.testing.assert_array_equal(np.asarray(best), np.asarray(expect))


def test_ignore_band(anchors, rng):
    """unmatched < iou < matched -> -2 codes survive the kernel path."""
    boxes, cls = _random_batch(rng, b=2, m=8)
    matches = pallas_label_match(anchors, boxes, cls,
                                 matched_threshold=0.5,
                                 unmatched_threshold=0.3)
    m = np.asarray(matches)
    assert (m == -2).any(), "expected some ignored anchors with a 0.3/0.5 band"
    assert (m == -1).any() and (m >= 0).any()


def test_ignore_band_cls_targets_parity(anchors, rng):
    """The targets kernel must emit -2 class targets for ignore-band
    anchors, not collapse them to background -1 (the loss mask keys on
    -2 — ops/losses detection_loss_flat / reference loss.py:285)."""
    boxes, cls = _random_batch(rng, b=3, m=10)
    ref = batch_label_anchors(anchors, boxes, cls, impl="xla",
                              match_threshold=0.5, unmatched_threshold=0.3)
    out = batch_label_anchors(anchors, boxes, cls, impl="pallas",
                              match_threshold=0.5, unmatched_threshold=0.3)
    assert (np.asarray(ref.cls_targets) == -2).any(), \
        "fixture produced an empty ignore band"
    np.testing.assert_array_equal(np.asarray(out.cls_targets),
                                  np.asarray(ref.cls_targets))
    np.testing.assert_allclose(np.asarray(out.box_targets),
                               np.asarray(ref.box_targets), atol=1e-6)
