"""Native data core (csrc/data_core.cpp) parity vs the PIL host pipeline.

The native loader replaces the reference's PIL decode+resize workers
(effdet/data/dataset.py:46 — SURVEY §2.3), so its output must match PIL:
identical libjpeg decode, PIL-BILINEAR-compatible resize, ResizePad
letterbox placement and scale bookkeeping.
"""
import io
import os

import numpy as np
import pytest

from ood_object_detection_tpu.data import native_decode

pytestmark = pytest.mark.skipif(
    not native_decode.available(), reason="native data core unavailable")


@pytest.fixture(scope="module")
def jpeg_case(tmp_path_factory):
    from PIL import Image
    rng = np.random.default_rng(7)
    # smooth-ish content: JPEG is lossy, smoothness keeps decode stable
    base = rng.integers(0, 255, (5, 7, 3)).astype(np.uint8)
    img = Image.fromarray(base).resize((340, 220), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=92)
    path = tmp_path_factory.mktemp("imgs") / "a.jpg"
    path.write_bytes(buf.getvalue())
    return str(path), buf.getvalue(), img


def test_decode_matches_pil(jpeg_case):
    """Both decoders are libjpeg — the RGB output must be bit-identical."""
    from PIL import Image
    _, data, _ = jpeg_case
    ours = native_decode.decode_jpeg(data)
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("out_hw", [(64, 96), (110, 170), (440, 680)])
def test_resize_matches_pil_bilinear(jpeg_case, out_hw):
    """Triangle-filter resize parity with PIL BILINEAR (down and up),
    within fixed-point rounding (|diff| <= 1 everywhere)."""
    from PIL import Image
    _, data, _ = jpeg_case
    src = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ours = native_decode.resize_bilinear(src, out_hw)
    theirs = np.asarray(Image.fromarray(src).resize(
        (out_hw[1], out_hw[0]), Image.BILINEAR))
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    # PIL computes with 8-bit fixed-point weights, we use f32: every pixel
    # agrees to within one count, most exactly
    assert diff.max() <= 1
    assert diff.mean() < 0.25


def test_decode_letterbox_matches_resizepad(jpeg_case):
    """Letterbox output == ResizePad: top-left placement, zero fill, same
    recorded img_scale (reference transforms.py:75-107)."""
    from PIL import Image

    from ood_object_detection_tpu.data.transforms import ResizePad
    _, data, img = jpeg_case
    target = (256, 256)
    out = native_decode.decode_letterbox(data, target)
    assert out is not None
    canvas, scale, (oh, ow) = out
    assert (oh, ow) == (img.height, img.width)

    ref_img, anno = ResizePad(target, interpolation="bilinear")(
        Image.open(io.BytesIO(data)).convert("RGB"), {})
    assert scale == pytest.approx(anno["img_scale"], rel=1e-6)
    ref = np.asarray(ref_img, np.uint8)
    diff = np.abs(canvas.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    # padding region identical (zero fill)
    sh = int(img.height * min(target[0] / img.height, target[1] / img.width))
    assert (canvas[sh + 1:] == 0).all()


def test_load_letterbox_batch_threads_and_fallback(jpeg_case, tmp_path):
    """Batch loader: threads fill each canvas; a corrupt item reports
    rc != 0 with a zeroed canvas (callers PIL-fallback per item)."""
    path, data, _ = jpeg_case
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    paths = [path, str(bad), path, path]
    imgs, scales, sizes, rc = native_decode.load_letterbox_batch(
        paths, (128, 128), n_threads=2)
    assert imgs.shape == (4, 128, 128, 3)
    assert rc.tolist() == [0, 1, 0, 0]
    assert (imgs[1] == 0).all() and scales[1] == 1.0
    np.testing.assert_array_equal(imgs[0], imgs[2])
    single = native_decode.decode_letterbox(data, (128, 128))
    np.testing.assert_array_equal(imgs[0], single[0])
    assert scales[0] == pytest.approx(single[1])


def test_native_eval_loader_contract(jpeg_case, tmp_path):
    """NativeEvalLoader yields the predict-bench input contract, pads the
    tail batch, and PIL-falls-back for non-JPEG files."""
    from PIL import Image
    path, data, img = jpeg_case
    png = tmp_path / "b.png"
    Image.open(io.BytesIO(data)).convert("RGB").save(png)
    loader = native_decode.NativeEvalLoader(
        [path, str(png), path], target_hw=(96, 96), batch_size=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    b0, b1 = batches
    assert b0["image"].shape == (2, 96, 96, 3)
    assert b0["img_size"][0].tolist() == [img.width, img.height]
    # PNG item fell back to PIL and produced real content + correct scale
    assert b0["image"][1].max() > 0
    assert b0["img_scale"][1] == pytest.approx(b0["img_scale"][0], rel=1e-6)
    # tail batch padded to the fixed batch size
    assert b1["image"].shape == (2, 96, 96, 3)
    assert (b1["image"][1] == 0).all()
