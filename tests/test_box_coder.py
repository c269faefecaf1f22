import numpy as np
import pytest

from ood_object_detection_tpu.ops.box_coder import (
    decode_boxes,
    encode_boxes,
)


def _random_boxes(rng, n):
    ymin = rng.uniform(0, 400, n)
    xmin = rng.uniform(0, 400, n)
    h = rng.uniform(5, 100, n)
    w = rng.uniform(5, 100, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], axis=1).astype(np.float32)


def test_encode_decode_roundtrip(rng):
    boxes = _random_boxes(rng, 64)
    anchors = _random_boxes(rng, 64)
    codes = encode_boxes(boxes, anchors)
    decoded = decode_boxes(codes, anchors)
    np.testing.assert_allclose(np.asarray(decoded), boxes, rtol=1e-4, atol=5e-3)


def test_encode_decode_with_scale_factors(rng):
    boxes = _random_boxes(rng, 32)
    anchors = _random_boxes(rng, 32)
    sf = [10.0, 10.0, 5.0, 5.0]
    codes = encode_boxes(boxes, anchors, scale_factors=sf)
    decoded = decode_boxes(codes, anchors, scale_factors=sf)
    np.testing.assert_allclose(np.asarray(decoded), boxes, rtol=1e-4, atol=5e-3)


def test_identity_encoding(rng):
    anchors = _random_boxes(rng, 8)
    codes = encode_boxes(anchors, anchors)
    np.testing.assert_allclose(np.asarray(codes), 0.0, atol=1e-5)


def test_decode_output_xyxy(rng):
    boxes = _random_boxes(rng, 8)
    anchors = _random_boxes(rng, 8)
    codes = encode_boxes(boxes, anchors)
    yxyx = np.asarray(decode_boxes(codes, anchors))
    xyxy = np.asarray(decode_boxes(codes, anchors, output_xyxy=True))
    np.testing.assert_allclose(xyxy[:, [1, 0, 3, 2]], yxyx, rtol=1e-6)


def test_parity_vs_reference_box_coder(rng, reference_path):
    torch = pytest.importorskip("torch")
    from effdet.object_detection.box_coder import FasterRcnnBoxCoder
    from effdet.object_detection.box_list import BoxList

    boxes = _random_boxes(rng, 128)
    anchors = _random_boxes(rng, 128)

    coder = FasterRcnnBoxCoder()
    ref_codes = coder.encode(
        BoxList(torch.from_numpy(boxes)), BoxList(torch.from_numpy(anchors))
    ).numpy()
    my_codes = np.asarray(encode_boxes(boxes, anchors))
    np.testing.assert_allclose(my_codes, ref_codes, rtol=1e-3, atol=1e-4)

    ref_decoded = coder.decode(
        torch.from_numpy(ref_codes), BoxList(torch.from_numpy(anchors))
    ).boxes().numpy()
    my_decoded = np.asarray(decode_boxes(my_codes, anchors))
    np.testing.assert_allclose(my_decoded, ref_decoded, rtol=1e-4, atol=5e-3)
