"""Real-data arm of the meta driver: --coco-ann/--data-dir/--support-dir
(reference dataloader.py:274-276 web-image glob + preloader.py:153-278
metadata pools) exercised end-to-end on a tiny on-disk COCO fixture.
"""
import json
import os

import numpy as np
import pytest


def _color_image(path, color, w=64, h=64, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 50, (h, w, 3)).astype(np.uint8)
    img[8:40, 8:40] = color
    Image.fromarray(img).save(path)


CAT_COLORS = {1: (220, 40, 40), 2: (40, 220, 40), 3: (40, 40, 220)}
CAT_NAMES = {1: "cat", 2: "dog", 3: "bird"}


def _write_coco_fixture(root):
    """3 categories x 4 images, one class-colored box each."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    iid = aid = 0
    for cat in (1, 2, 3):
        for j in range(4):
            iid += 1
            fname = f"im{iid}.jpg"
            _color_image(os.path.join(img_dir, fname), CAT_COLORS[cat],
                         seed=iid)
            images.append(dict(id=iid, file_name=fname, width=64, height=64))
            aid += 1
            annotations.append(dict(
                id=aid, image_id=iid, category_id=cat,
                bbox=[8, 8, 32, 32], iscrowd=0, area=1024))
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump({
            "categories": [dict(id=c, name=CAT_NAMES[c]) for c in (1, 2, 3)],
            "images": images, "annotations": annotations}, f)
    return ann_path, img_dir


def _write_support_dir(root):
    """root/<category name>/*.jpg — the reference web-image layout."""
    sup = os.path.join(root, "support")
    for cat, name in CAT_NAMES.items():
        d = os.path.join(sup, name)
        os.makedirs(d, exist_ok=True)
        for j in range(3):
            _color_image(os.path.join(d, f"s{j}.jpg"), CAT_COLORS[cat],
                         seed=1000 + cat * 10 + j)
    return sup


def test_query_support_fallback_is_lazy():
    from ood_object_detection_tpu.data.episodic import QuerySupportFallback

    calls = []

    class Src:
        def images_for(self, cat):
            calls.append(cat)
            return [(cat, 0), (cat, 1)]

        def load(self, key):
            return f"img{key}", None

    sup = QuerySupportFallback(Src(), [1, 2, 3])
    assert len(sup) == 3 and 2 in sup and 9 not in sup
    assert calls == [], "loaders must not be built before access"
    pool = sup[2]
    assert calls == [2] and len(pool) == 2
    assert pool[0]() == "img(2, 0)"
    sup[2]
    assert calls == [2], "per-category pools must be cached"
    assert sup.get(9) is None


@pytest.mark.slow
def test_meta_cli_real_data(tmp_path, capsys):
    """--coco-ann + --support-dir + --eval-map end-to-end (VERDICT r2
    item 5): nonzero episodes, finite losses, val metrics, checkpoint."""
    from ood_object_detection_tpu.meta import train_driver

    root = str(tmp_path)
    ann, img_dir = _write_coco_fixture(root)
    sup_dir = _write_support_dir(root)
    ckpt_dir = tmp_path / "meta_ckpts"

    train_driver.main([
        "--model", "efficientdet_d0",
        "--img-size", "128", "--qry-img-size", "128",
        "--fpn-repeats", "1", "--head-repeats", "1",
        "--n-way", "1", "--num-sup", "2", "--num-qry", "2",
        "--num-zero-images", "1", "--meta-batch-size", "1",
        "--proj-iters", "2", "--total-iters", "8", "--val-freq", "4",
        "--log-freq", "2",
        "--coco-ann", ann, "--data-dir", img_dir, "--support-dir", sup_dir,
        "--num-train-cats", "2", "--num-val-cats", "1", "--eval-map",
        "--checkpoint-dir", str(ckpt_dir),
        "--per-cat-dir", str(tmp_path / "per_cat"),
    ])
    out = capsys.readouterr().out
    logs = []
    for ln in out.splitlines():
        try:
            logs.append(json.loads(ln))
        except ValueError:
            continue
    assert logs and logs[-1].get("final_iter") == 8
    phases = {l.get("phase") for l in logs if "phase" in l}
    assert "proj" in phases and "maml" in phases, phases
    for l in logs:
        for k, v in l.items():
            if k.endswith("loss") and v is not None:
                assert np.isfinite(v), (k, l)
    assert any("val_loss" in l for l in logs), "no validation block ran"
    assert os.listdir(ckpt_dir), "no checkpoint written"


@pytest.mark.slow
def test_meta_cli_real_data_query_fallback(tmp_path, capsys):
    """Without --support-dir the lazy query-as-support fallback drives the
    episodes (supports drawn from the category's own query images)."""
    from ood_object_detection_tpu.meta import train_driver

    root = str(tmp_path)
    ann, img_dir = _write_coco_fixture(root)

    train_driver.main([
        "--model", "efficientdet_d0",
        "--img-size", "128", "--qry-img-size", "128",
        "--fpn-repeats", "1", "--head-repeats", "1",
        "--n-way", "1", "--num-sup", "2", "--num-qry", "2",
        "--num-zero-images", "1", "--meta-batch-size", "1",
        "--proj-iters", "1", "--total-iters", "3", "--val-freq", "0",
        "--log-freq", "1",
        "--coco-ann", ann, "--data-dir", img_dir,
        "--num-train-cats", "2", "--num-val-cats", "1",
        "--checkpoint-dir", str(tmp_path / "ckpts"),
        "--per-cat-dir", str(tmp_path / "per_cat"),
    ])
    out = capsys.readouterr().out
    logs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert logs and logs[-1].get("final_iter") == 3
