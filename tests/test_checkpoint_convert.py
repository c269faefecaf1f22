import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.models import EfficientDet
from ood_object_detection_tpu.utils.checkpoint_convert import (
    _translate_name,
    convert_state_dict,
    merge_into_variables,
)


def test_translate_names():
    cases = {
        "backbone.conv_stem.weight":
            (("backbone", "conv_stem"), "kernel", "params"),
        "backbone.bn1.weight":
            (("backbone", "bn_stem"), "scale", "params"),
        "backbone.bn1.running_mean":
            (("backbone", "bn_stem"), "mean", "batch_stats"),
        "backbone.blocks.1.0.conv_pwl.weight":
            (("backbone", "blocks_1_0", "conv_pwl"), "kernel", "params"),
        "backbone.blocks.1.0.bn3.weight":
            (("backbone", "blocks_1_0", "bn3"), "scale", "params"),
        "backbone.blocks.2.1.se.conv_reduce.bias":
            (("backbone", "blocks_2_1", "se", "conv_reduce"), "bias", "params"),
        "fpn.resample.3.conv.conv.weight":
            (("fpn", "resample_3", "conv", "conv"), "kernel", "params"),
        "fpn.resample.3.conv.bn.running_var":
            (("fpn", "resample_3", "conv", "bn"), "var", "batch_stats"),
        "fpn.cell.0.fnode.0.combine.edge_weights":
            (("fpn", "cell_0", "fnode_0", "combine"), "edge_weights", "params"),
        "fpn.cell.2.fnode.7.combine.resample.1.conv.conv.weight":
            (("fpn", "cell_2", "fnode_7", "combine", "resample_1", "conv",
              "conv"), "kernel", "params"),
        "fpn.cell.0.fnode.3.after_combine.conv.conv_dw.weight":
            (("fpn", "cell_0", "fnode_3", "after_combine_conv", "conv_dw"),
             "kernel", "params"),
        "fpn.cell.0.fnode.3.after_combine.conv.bn.weight":
            (("fpn", "cell_0", "fnode_3", "after_combine_conv", "bn"),
             "scale", "params"),
        "class_net.conv_rep.1.conv_pw.weight":
            (("class_net", "conv_rep_1", "conv_pw"), "kernel", "params"),
        "class_net.bn_rep.0.2.bn.bias":
            (("class_net", "bn_rep_0_2"), "bias", "params"),
        "class_net.bn_rep.0.2.bn.running_mean":
            (("class_net", "bn_rep_0_2"), "mean", "batch_stats"),
        "box_net.predict.conv_pw.bias":
            (("box_net", "predict", "conv_pw"), "bias", "params"),
    }
    for torch_name, expected in cases.items():
        assert _translate_name(torch_name) == expected, torch_name


def test_num_batches_tracked_skipped():
    assert _translate_name("backbone.bn1.num_batches_tracked") is None


def test_kernel_layout_conversion():
    sd = {"backbone.conv_stem.weight": np.zeros((32, 3, 3, 3), np.float32)}
    out = convert_state_dict(sd)
    assert out["params"]["backbone"]["conv_stem"]["kernel"].shape == (3, 3, 3, 32)


def _inverse_name(path, leaf, collection):
    """Build the reference torch name for one of our flax tree paths
    (the inverse of _translate_name, used to synthesize a state_dict)."""
    parts = []
    for p in path:
        if re.fullmatch(r"blocks_\d+_\d+", p):
            _, s, b = p.split("_")
            parts += ["blocks", s, b]
        elif p == "bn_stem":
            parts += ["bn1"]
        elif re.fullmatch(r"resample_\d+", p):
            parts += ["resample", p.split("_")[1]]
        elif re.fullmatch(r"cell_\d+", p):
            parts += ["cell", p.split("_")[1]]
        elif re.fullmatch(r"fnode_\d+", p):
            parts += ["fnode", p.split("_")[1]]
        elif p == "after_combine_conv":
            parts += ["after_combine", "conv"]
        elif re.fullmatch(r"conv_rep_\d+", p):
            parts += ["conv_rep", p.split("_")[-1]]
        elif re.fullmatch(r"bn_rep_\d+_\d+", p):
            _, _, r, l = p.split("_")
            parts += ["bn_rep", r, l, "bn"]
        else:
            parts.append(p)
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var",
                "edge_weights": "edge_weights"}
    return ".".join(parts + [leaf_map[leaf]])


def test_full_model_roundtrip():
    """Synthesize a torch-named state_dict covering every param of a tiny
    model, convert, and check every leaf loads with correct values."""
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1)
    model = EfficientDet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(
        lambda k: model.init(k, x, training=False))(jax.random.key(0))

    rng = np.random.default_rng(0)
    state_dict = {}
    expected = {}
    flat = jax.tree_util.tree_flatten_with_path(
        {k: variables[k] for k in ("params", "batch_stats")})[0]
    for pathkeys, val in flat:
        keys = tuple(str(getattr(k, "key", k)) for k in pathkeys)
        collection, path, leaf = keys[0], keys[1:-1], keys[-1]
        torch_name = _inverse_name(path, leaf, collection)
        arr = rng.normal(0, 1, val.shape).astype(np.float32)
        expected[(collection,) + path + (leaf,)] = arr
        if leaf == "kernel" and arr.ndim == 4:
            state_dict[torch_name] = np.transpose(arr, (3, 2, 0, 1))
        elif leaf == "kernel" and arr.ndim == 2:
            state_dict[torch_name] = np.transpose(arr, (1, 0))
        else:
            state_dict[torch_name] = arr

    converted = convert_state_dict(state_dict)
    new_vars, report = merge_into_variables(
        {k: variables[k] for k in ("params", "batch_stats")}, converted)
    assert not report["missing"], report["missing"][:10]
    assert not report["unexpected"], report["unexpected"][:10]

    # value spot checks, including a transposed conv kernel
    got = new_vars["params"]["backbone"]["conv_stem"]["kernel"]
    want = expected[("params", "backbone", "conv_stem", "kernel")]
    np.testing.assert_allclose(got, want)
    got = new_vars["batch_stats"]["backbone"]["bn_stem"]["mean"]
    want = expected[("batch_stats", "backbone", "bn_stem", "mean")]
    np.testing.assert_allclose(got, want)


def test_download_checkpoint_caches(tmp_path, monkeypatch):
    """URL pretrained loading (reference load_pretrained, helpers.py:14-23):
    fetch once into the cache, reuse thereafter."""
    import urllib.request

    from ood_object_detection_tpu.utils.pretrained import (
        PRETRAINED_URLS,
        download_checkpoint,
    )

    calls = []

    def fake_retrieve(url, dst):
        calls.append(url)
        with open(dst, "wb") as f:
            f.write(b"ckpt")

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    p1 = download_checkpoint("efficientdet_d0", cache_dir=str(tmp_path))
    p2 = download_checkpoint("efficientdet_d0", cache_dir=str(tmp_path))
    assert p1 == p2
    assert len(calls) == 1
    assert calls[0] == PRETRAINED_URLS["efficientdet_d0"]
    assert open(p1, "rb").read() == b"ckpt"

    with pytest.raises(ValueError):
        download_checkpoint("efficientdet_d3", cache_dir=str(tmp_path))


def test_extract_state_dict_ema_variants():
    """EMA-aware extraction mirrors timm load_checkpoint(use_ema=...)
    (reference helpers.py:6, factory.py:46-47)."""
    from ood_object_detection_tpu.utils.checkpoint_convert import (
        extract_state_dict,
    )

    w = np.ones((3,), np.float32)
    w_ema = np.full((3,), 2.0, np.float32)

    # 1. nested container with state_dict_ema
    ckpt = {"state_dict": {"class_net.predict.bias": w},
            "state_dict_ema": {"class_net.predict.bias": w_ema},
            "epoch": 7}
    assert extract_state_dict(ckpt)["class_net.predict.bias"][0] == 1.0
    assert extract_state_dict(ckpt, use_ema=True)[
        "class_net.predict.bias"][0] == 2.0

    # 2. 'model' / 'model_ema' container keys
    ckpt2 = {"model": {"w": w}, "model_ema": {"w": w_ema}}
    assert extract_state_dict(ckpt2)["w"][0] == 1.0
    assert extract_state_dict(ckpt2, use_ema=True)["w"][0] == 2.0

    # 3. flat state_dict with ema_-prefixed keys
    flat = {"w": w, "ema_w": w_ema, "ema.v": w_ema}
    assert extract_state_dict(flat)["w"][0] == 1.0
    ema = extract_state_dict(flat, use_ema=True)
    assert set(ema) == {"w", "v"} and ema["w"][0] == 2.0

    # 4. use_ema on a checkpoint with no EMA falls back to plain weights
    ckpt3 = {"state_dict": {"w": w}}
    assert extract_state_dict(ckpt3, use_ema=True)["w"][0] == 1.0

    # 5. raw state_dict passthrough
    assert extract_state_dict({"w": w})["w"][0] == 1.0


def test_load_pytorch_checkpoint_use_ema(tmp_path):
    """End-to-end: converter restores EMA weights from an EMA-shaped
    torch checkpoint when use_ema=True."""
    torch = pytest.importorskip("torch")
    from ood_object_detection_tpu.utils.checkpoint_convert import (
        load_pytorch_checkpoint,
    )

    plain = {"class_net.predict.pointwise.bias": torch.zeros(4)}
    ema = {"class_net.predict.pointwise.bias": torch.full((4,), 5.0)}
    path = tmp_path / "ema_ckpt.pth"
    torch.save({"state_dict": plain, "state_dict_ema": ema}, path)

    variables = {"params": {"class_net": {"predict": {"pointwise": {
        "bias": np.full((4,), -1.0, np.float32)}}}}}
    new_vars, report = load_pytorch_checkpoint(str(path), variables)
    assert new_vars["params"]["class_net"]["predict"]["pointwise"][
        "bias"][0] == 0.0
    new_vars, report = load_pytorch_checkpoint(
        str(path), variables, use_ema=True)
    assert new_vars["params"]["class_net"]["predict"]["pointwise"][
        "bias"][0] == 5.0
    assert report["loaded"]
