"""CLI driver smoke tests: the pretrain and meta entry points run
end-to-end (train + val + eval-map + checkpointing) on tiny configs.

These are the rebuild's regression gate for the reference's two drivers
(pretrain.py:68-406, infer.py:102-866) — every flag-path they exercise
here maps to reference behavior: val interleaving, best-val checkpointing,
per-episode mAP/CorLoc, per-category npy dumps.
"""
import json
import os

import numpy as np
import pytest


def _json_lines(capsys):
    out = capsys.readouterr().out
    lines = []
    for ln in out.splitlines():
        try:
            lines.append(json.loads(ln))
        except ValueError:
            continue
    return lines


@pytest.mark.slow
def test_pretrain_cli_smoke(tmp_path, capsys):
    from ood_object_detection_tpu.train import pretrain

    ckpt_dir = tmp_path / "ckpts"
    per_cat = tmp_path / "per_cat"
    pretrain.main([
        "--model", "efficientdet_d0", "--num-classes", "4",
        "--image-size", "128", "--fpn-repeats", "1", "--head-repeats", "1",
        "--batch-size", "2", "--steps", "6", "--val-freq", "3",
        "--val-steps", "1", "--log-freq", "2", "--warmup-steps", "2",
        "--mesh", "2", "--workers", "0", "--eval-map",
        "--checkpoint-dir", str(ckpt_dir), "--per-cat-dir", str(per_cat),
    ])
    logs = _json_lines(capsys)
    train_logs = [l for l in logs if "loss" in l]
    assert train_logs, "no train JSON-lines logged"
    assert all(np.isfinite(l["loss"]) for l in train_logs)
    val_logs = [l for l in logs if "val_mAP" in l]
    assert val_logs, "--eval-map produced no val mAP logs"
    assert os.listdir(ckpt_dir), "no checkpoint written"
    npys = list(per_cat.glob("*.npy"))
    assert npys, "no per-category AP dumps"


@pytest.mark.slow
def test_meta_cli_smoke(tmp_path, capsys):
    from ood_object_detection_tpu.meta import train_driver

    ckpt_dir = tmp_path / "meta_ckpts"
    per_cat = tmp_path / "per_cat"
    train_driver.main([
        "--model", "efficientdet_d0",
        "--img-size", "128", "--qry-img-size", "128",
        "--fpn-repeats", "1", "--head-repeats", "1",
        "--n-way", "2", "--num-sup", "2", "--num-qry", "2",
        "--num-zero-images", "1", "--meta-batch-size", "1",
        "--proj-iters", "2", "--total-iters", "6", "--val-freq", "3",
        "--log-freq", "2", "--synthetic-cats", "4", "--eval-map",
        "--eval-ood",
        "--checkpoint-dir", str(ckpt_dir), "--per-cat-dir", str(per_cat),
    ])
    logs = _json_lines(capsys)
    assert logs and "final_iter" in logs[-1]
    assert logs[-1]["final_iter"] == 6
    phases = {l.get("phase") for l in logs if "phase" in l}
    assert "proj" in phases and "maml" in phases, phases
    assert os.listdir(ckpt_dir), "no meta checkpoint written"
    # --eval-ood: open-set AUROC/FPR95 logged per val block; GT-region
    # scores are never empty, so the ROC must be a real number
    ood_logs = [l for l in logs if "ood_auroc_gt" in l]
    assert ood_logs, "no open-set metrics logged"
    assert all(isinstance(l["ood_auroc_gt"], float) and
               0.0 <= l["ood_auroc_gt"] <= 1.0 for l in ood_logs), ood_logs
