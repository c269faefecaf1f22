"""Deploy-path golden fixture: bytes-on-disk JPEGs -> pinned detections.

Shared by tests/test_deploy_golden.py (CPU regression) and the TPU
evidence run (benchmarks/DEPLOY_TPU.json). The JPEGs under
tests/data/deploy_fixture/ are COMMITTED (synthesized once by
``python tests/deploy_fixture.py regen-images``) so every platform
decodes identical bytes through the native C++ loader; the weights are
reconstructed deterministically (init seed 0 + a fixed class-bias boost
so an untrained head clears the serving score threshold — see
tests/test_post_process.py for the 0.01 prior/MIN_SCORE boundary).

Regenerate goldens (after an intentional behavior change):
    python tests/deploy_fixture.py regen-golden
"""
from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE_DIR = os.path.join(HERE, "data", "deploy_fixture")
GOLDEN_PATH = os.path.join(FIXTURE_DIR, "golden.json")
N_IMAGES = 5
# classes whose predict bias is boosted above the serving threshold
BOOST_CLASSES = (3, 17, 42)
BOOST_LOGIT = 2.6
TOP_ROWS = 10  # rows pinned per image


def synthesize_images(out_dir: str = FIXTURE_DIR) -> list:
    """5 deterministic photographic-complexity JPEGs (smooth background
    gradients + elliptic 'objects' + texture noise), mixed sizes/aspects."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260820)
    sizes = [(480, 640), (640, 480), (300, 500), (512, 512), (240, 320)]
    paths = []
    for i, (h, w) in enumerate(sizes):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([
            120 + 80 * np.sin(2 * np.pi * xx / w + i),
            100 + 60 * np.cos(2 * np.pi * yy / h - i),
            90 + 50 * np.sin(2 * np.pi * (xx + yy) / (h + w)),
        ], axis=-1)
        for _ in range(4 + i):  # elliptic blobs of varying size/color
            cy, cx = rng.uniform(0.2, 0.8, 2) * (h, w)
            ry, rx = rng.uniform(0.05, 0.25, 2) * (h, w)
            color = rng.uniform(0, 255, 3)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            img[mask] = 0.35 * img[mask] + 0.65 * color
        img += rng.normal(0, 6.0, img.shape)  # sensor-like noise
        path = os.path.join(out_dir, f"fixture_{i}.jpg")
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            path, quality=90)
        paths.append(path)
    return paths


def build_checkpoint(ckpt_dir: str) -> str:
    """Deterministic D0 weights with BOOST_CLASSES' predict bias raised so
    detections clear the deploy score threshold (untrained heads otherwise
    sit just under the strict 0.01 NMS pre-filter)."""
    import jax.numpy as jnp

    from ood_object_detection_tpu.factory import create_model
    from ood_object_detection_tpu.train.checkpoint import save_variables

    import jax

    bench, variables = create_model("efficientdet_d0", bench_task="predict",
                                    num_classes=90, seed=0)
    # Fresh-init activations DECAY through the trunk (swish(x) ~ x/2 for
    # small x; ~50 layers -> FPN outputs ~1e-10 underflow), so class
    # logits collapse to exactly the bias and carry no image signal.
    # Calibrate the BN running stats instead: one training-mode pass
    # self-normalizes every layer with its batch stats, and the EMA
    # update running' = (1-m)*old + m*batch with m=0.01 is inverted
    # exactly to recover those batch stats as the new running stats —
    # after which eval-mode activations stay O(1) end to end and the
    # fixture's detections are image-dependent (the point of the golden).
    model = bench.model
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.uniform(-2, 2, (4, 512, 512, 3))
                        .astype(np.float32))
    _, mut = model.apply(variables, calib, training=True,
                         mutable=["batch_stats"])
    m = 0.01

    def recover(path, new, old):
        batch = (np.asarray(new, np.float64)
                 - (1 - m) * np.asarray(old, np.float64)) / m
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "var":   # fp cancellation can go slightly negative
            batch = np.maximum(batch, 0.0)
        return jnp.asarray(batch.astype(np.float32))

    stats = jax.tree_util.tree_map_with_path(
        recover, mut["batch_stats"], variables["batch_stats"])
    variables = {**variables, "batch_stats": stats}

    params = dict(variables["params"])
    cn = dict(params["class_net"])
    pred = {k: dict(v) for k, v in cn["predict"].items()}
    bias = np.asarray(pred["conv_pw"]["bias"]).reshape(9, 90).copy()
    bias[:, list(BOOST_CLASSES)] += BOOST_LOGIT
    pred["conv_pw"]["bias"] = jnp.asarray(bias.reshape(-1))
    # with the calibrated O(1) trunk, raw random predict kernels push some
    # logits past +10 (scores pin at 1.0 — no ordering signal) and box
    # deltas past exp() sanity (degenerate boxes); scale them so scores
    # spread below saturation and boxes stay anchor-sized
    pred["conv_pw"]["kernel"] = jnp.asarray(
        np.asarray(pred["conv_pw"]["kernel"]) * 0.01)
    cn["predict"] = pred
    params["class_net"] = cn
    bn = dict(params["box_net"])
    bpred = {k: dict(v) for k, v in bn["predict"].items()}
    bpred["conv_pw"]["kernel"] = jnp.asarray(
        np.asarray(bpred["conv_pw"]["kernel"]) * 0.05)
    bn["predict"] = bpred
    params["box_net"] = bn
    variables = {**variables, "params": params}
    path = os.path.join(ckpt_dir, "deploy_golden_ckpt")
    save_variables(path, variables)
    return path


def run_deploy(ckpt_path: str, out_path: str,
               image_dir: str = FIXTURE_DIR) -> dict:
    """Drive examples/deploy_infer.main on the fixture; return results."""
    import sys
    sys.path.insert(0, os.path.dirname(HERE))
    from examples.deploy_infer import main as deploy_main

    deploy_main(["--image-dir", image_dir, "--checkpoint", ckpt_path,
                 "--batch-size", str(N_IMAGES), "--out", out_path,
                 "--score-threshold", "0.1"])
    with open(out_path) as f:
        return json.load(f)


def summarize(results: list) -> list:
    """Golden form: per image, the detection count + top TOP_ROWS rows."""
    out = []
    for r in sorted(results, key=lambda r: os.path.basename(r["path"])):
        dets = r["detections"]
        out.append({
            "image": os.path.basename(r["path"]),
            "num_detections": len(dets),
            "rows": [
                {"box_xyxy": d["box_xyxy"], "score": d["score"],
                 "class": d["class"], "ood_score": d["ood_score"]}
                for d in dets[:TOP_ROWS]],
        })
    return out


if __name__ == "__main__":
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(HERE))  # repo root for the package

    cmd = sys.argv[1] if len(sys.argv) > 1 else "regen-golden"
    if cmd == "regen-images":
        print("\n".join(synthesize_images()))
    elif cmd == "regen-golden":
        with tempfile.TemporaryDirectory() as td:
            ckpt = build_checkpoint(td)
            res = run_deploy(ckpt, os.path.join(td, "dets.json"))
        golden = summarize(res)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"wrote {GOLDEN_PATH}: "
              f"{[g['num_detections'] for g in golden]} detections")
    else:
        raise SystemExit(f"unknown command {cmd}")
