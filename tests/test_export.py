"""Serving-export tests: StableHLO artifact roundtrip, symbolic batch,
multi-platform lowering, preproc-embedded variant.

The reference has no serving-export analog (deployment = rebuild the torch
model + load .pth, reference infer.py:198-201); this subsystem is a
TPU-production addition. The contract under test: a saved artifact is
self-contained (weights embedded), reproduces the live bench bit-exactly,
and serves any batch size when exported with a symbolic batch dim.
"""
import json
import os

import numpy as np
import pytest

import ood_object_detection_tpu as pkg
from ood_object_detection_tpu import export as ex
from ood_object_detection_tpu.factory import create_model


@pytest.fixture(scope="module")
def small_bench():
    return create_model(
        "efficientdet_d0", bench_task="predict", num_classes=8,
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1,
        ood_method="energy")


def test_roundtrip_matches_live_bench(small_bench, tmp_path):
    bench, variables = small_bench
    exp = ex.export_predict(bench, variables, batch_size=2)
    path = ex.save_artifact(str(tmp_path / "art"), exp, bench)
    mod = ex.load_artifact(path)

    x = np.random.default_rng(0).uniform(
        -2, 2, (2, 128, 128, 3)).astype(np.float32)
    dets, ood = mod(x)
    ref_dets, ref_ood = bench.forward_with_ood(variables, x)
    np.testing.assert_array_equal(np.asarray(dets), np.asarray(ref_dets))
    np.testing.assert_array_equal(np.asarray(ood), np.asarray(ref_ood))

    manifest = mod.manifest
    assert manifest["model"] == "efficientdet_d0"
    assert manifest["num_classes"] == 8
    assert manifest["ood_method"] == "energy"
    assert os.path.exists(os.path.join(path, ex.ARTIFACT_FILE))


def test_symbolic_batch_serves_any_batch_size(small_bench):
    bench, variables = small_bench
    exp = ex.export_predict(bench, variables, batch_size=None)
    assert str(exp.in_avals[0].shape[0]) == "b"
    mod = ex.ServingModule(ex.jax_export.deserialize(exp.serialize()))

    rng = np.random.default_rng(1)
    for bs in (1, 3):
        x = rng.uniform(-2, 2, (bs, 128, 128, 3)).astype(np.float32)
        dets, ood = mod(x)
        assert dets.shape == (bs, 100, 6)
        assert ood.shape == (bs, 100)
        ref_dets, _ = bench.forward_with_ood(variables, x)
        np.testing.assert_array_equal(np.asarray(dets), np.asarray(ref_dets))


def test_multi_platform_lowering(small_bench, tmp_path):
    """One artifact lowered for tpu+cpu dispatches to the present backend."""
    bench, variables = small_bench
    exp = ex.export_predict(bench, variables, batch_size=1,
                            platforms=("tpu", "cpu"))
    assert exp.platforms == ("tpu", "cpu")
    path = ex.save_artifact(str(tmp_path / "multi"), exp, bench)
    with open(os.path.join(path, ex.MANIFEST_FILE)) as f:
        manifest = json.load(f)
    assert manifest["platforms"] == ["tpu", "cpu"]
    mod = ex.load_artifact(path)
    dets, _ = mod(np.zeros((1, 128, 128, 3), np.float32))
    assert dets.shape == (1, 100, 6)


def test_preproc_embedded_artifact(small_bench):
    """with_preproc=True artifacts take raw uint8 canvases + true (h, w)."""
    bench, variables = small_bench
    exp = ex.export_predict(bench, variables, batch_size=None,
                            with_preproc=True)
    mod = ex.ServingModule(ex.jax_export.deserialize(exp.serialize()))
    cv = np.random.default_rng(2).integers(
        0, 255, (2, 128, 128, 3)).astype(np.uint8)
    hw = np.array([[128, 96], [64, 128]], np.int32)
    dets, ood = mod(cv, hw)
    assert dets.shape == (2, 100, 6)
    assert np.isfinite(np.asarray(ood)).all()


def test_top_level_api_exposes_export():
    assert pkg.export_predict is ex.export_predict
    assert pkg.save_artifact is ex.save_artifact
    assert pkg.load_artifact is ex.load_artifact


def test_manifest_derives_preproc_from_signature(small_bench, tmp_path):
    """save_artifact must not need a with_preproc flag — it is derived
    from the exported input signature (uint8 canvases + int32 true_hw)."""
    bench, variables = small_bench
    exp = ex.export_predict(bench, variables, batch_size=1,
                            with_preproc=True)
    path = ex.save_artifact(str(tmp_path / "pre"), exp, bench)
    with open(os.path.join(path, ex.MANIFEST_FILE)) as f:
        manifest = json.load(f)
    assert manifest["with_preproc"] is True
    exp2 = ex.export_predict(bench, variables, batch_size=1)
    path2 = ex.save_artifact(str(tmp_path / "nopre"), exp2, bench)
    with open(os.path.join(path2, ex.MANIFEST_FILE)) as f:
        manifest2 = json.load(f)
    assert manifest2["with_preproc"] is False
