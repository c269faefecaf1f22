import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.ops.anchors import (
    Anchors,
    generate_anchor_boxes,
    get_feat_sizes,
)


def test_feat_sizes_512():
    fs = get_feat_sizes((512, 512), 7)
    assert fs == [(512, 512), (256, 256), (128, 128), (64, 64), (32, 32),
                  (16, 16), (8, 8), (4, 4)]


def test_feat_sizes_odd():
    fs = get_feat_sizes((513, 513), 3)
    assert fs == [(513, 513), (257, 257), (129, 129), (65, 65)]


def test_total_anchor_count_d0():
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    # levels 3..7 at 512: 64^2+32^2+16^2+8^2+4^2 = 5456 cells, 9 anchors each
    assert anchors.total_anchors == 5456 * 9
    assert anchors.boxes.shape == (49104, 4)
    assert anchors.boxes.dtype == np.float32


def test_first_anchor_level3():
    """Level 3, octave 0, aspect (1,1): base 4*8=32, centered at (4,4)."""
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    np.testing.assert_allclose(anchors.boxes[0], [-12.0, -12.0, 20.0, 20.0])


def test_anchor_aspect_ratios():
    """Second anchor config at a cell is aspect (1.4, 0.7)."""
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    a = anchors.boxes[1]  # cell 0, config 1
    w = a[3] - a[1]
    h = a[2] - a[0]
    np.testing.assert_allclose(w, 32 * 1.4, rtol=1e-6)
    np.testing.assert_allclose(h, 32 * 0.7, rtol=1e-6)


def test_anchor_octave_scales():
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    a = anchors.boxes[3]  # cell 0, config 3 = octave 1/3, aspect (1,1)
    w = a[3] - a[1]
    np.testing.assert_allclose(w, 32 * 2 ** (1 / 3), rtol=1e-6)


def test_scalar_aspect_ratios():
    """Scalar ratios r are expanded to (sqrt(r), 1/sqrt(r))."""
    boxes_pair = generate_anchor_boxes(3, 3, 1, [(np.sqrt(2.0), 1 / np.sqrt(2.0))],
                                       4.0, (64, 64))
    boxes_scalar = generate_anchor_boxes(3, 3, 1, [2.0], 4.0, (64, 64))
    np.testing.assert_allclose(boxes_pair, boxes_scalar, rtol=1e-6)


def test_cell_major_ordering():
    """Anchors are cell-major: configs of cell 0 precede configs of cell 1."""
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    a9 = anchors.boxes[9]  # cell 1 (x=12), config 0
    yc = (a9[0] + a9[2]) / 2
    xc = (a9[1] + a9[3]) / 2
    np.testing.assert_allclose([yc, xc], [4.0, 12.0])


def test_level_sizes_and_unpack():
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg)
    assert anchors.level_sizes == [
        64 * 64 * 9, 32 * 32 * 9, 16 * 16 * 9, 8 * 8 * 9, 4 * 4 * 9]
    flat = np.arange(anchors.total_anchors, dtype=np.int32)
    levels = anchors.unpack_levels(flat)
    assert levels[0].shape == (64, 64, 9)
    assert levels[-1].shape == (4, 4, 9)
    assert levels[0][0, 0, 0] == 0
    assert levels[1][0, 0, 0] == 64 * 64 * 9


def test_min_level_offset_support_anchors():
    """Episodic support images use a min-level offset (anchors.py:236-247)."""
    cfg = get_efficientdet_config("efficientdet_d0")
    anchors = Anchors.from_config(cfg, img_size=256, min_level_offset=1)
    assert anchors.min_level == 4
    assert anchors.image_size == (256, 256)


def test_per_level_anchor_scales():
    boxes = generate_anchor_boxes(3, 4, 1, [(1.0, 1.0)], [4.0, 8.0], (64, 64))
    # level 4 first anchor has base 8*16=128
    n_l3 = 8 * 8
    a = boxes[n_l3]
    np.testing.assert_allclose(a[3] - a[1], 128.0)


def test_image_size_divisibility_asserted():
    cfg = get_efficientdet_config("efficientdet_d0").replace(image_size=(500, 500))
    with pytest.raises(AssertionError):
        Anchors.from_config(cfg)


def test_boxes_for_indices_matches_table():
    """Arithmetic anchor reconstruction == the generated table (to 1 ulp;
    the table subtracts in f64 before its f32 cast)."""
    import jax.numpy as jnp

    from ood_object_detection_tpu.config import get_efficientdet_config

    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(256, 256))
    anchors = Anchors.from_config(cfg)
    table = anchors.boxes                                   # [A, 4]
    all_ids = jnp.arange(table.shape[0], dtype=jnp.int32)
    rebuilt = np.asarray(anchors.boxes_for_indices(all_ids))
    np.testing.assert_allclose(rebuilt, table, atol=1e-3, rtol=0)
    # mostly bit-identical; the rest differ by ~1 ulp (f32 vs f64 subtract)
    assert (rebuilt == table).mean() > 0.8
    assert np.abs(rebuilt - table).max() < 1e-4

    # batched, shuffled ids
    rng = np.random.default_rng(0)
    ids = rng.integers(0, table.shape[0], (3, 64)).astype(np.int32)
    out = np.asarray(anchors.boxes_for_indices(jnp.asarray(ids)))
    np.testing.assert_allclose(out, table[ids], atol=1e-3, rtol=0)


def test_boxes_for_indices_detection_equivalence(rng):
    """generate_detections with arithmetic anchors == with the table."""
    import jax.numpy as jnp

    from ood_object_detection_tpu.config import get_efficientdet_config
    from ood_object_detection_tpu.ops.post_process import generate_detections

    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(128, 128))
    anchors = Anchors.from_config(cfg)
    fs = anchors.feat_sizes
    cls_out, box_out = [], []
    for lvl in range(anchors.min_level, anchors.max_level + 1):
        h, w = fs[lvl]
        co = rng.normal(-8, 1, (2, h, w, 9 * 4)).astype(np.float32)
        cls_out.append(jnp.asarray(co))
        box_out.append(jnp.asarray(
            rng.normal(0, 0.1, (2, h, w, 36)).astype(np.float32)))
    cls_out[0] = cls_out[0].at[:, 4, 4, 2].set(5.0)
    kw = dict(num_classes=4, max_detection_points=200, max_det_per_image=10,
              nms_impl="xla")
    det_t, _ = generate_detections(cls_out, box_out, anchors.boxes, **kw)
    det_a, _ = generate_detections(cls_out, box_out, anchors.boxes,
                                   anchors=anchors, **kw)
    np.testing.assert_allclose(np.asarray(det_a), np.asarray(det_t),
                               atol=1e-3)
