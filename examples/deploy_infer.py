"""Deployment inference pipeline: image files -> detections + OOD scores.

The full serving path on one chip: the native C++ loader
(csrc/data_core.cpp — threaded libjpeg decode + letterbox into fixed
uint8 canvases) feeds the fused on-device normalize + forward +
soft-NMS + energy-OOD graph, and detections are mapped back to original
image coordinates via the recorded letterbox scale.

Equivalent of running the reference's DetBenchPredict over a directory
(effdet/bench.py:79-103 + data loader), but with no PIL, no per-image
Python post-processing, and no host round-trips inside a batch.

Run: python -m examples.deploy_infer --image-dir /path/to/jpegs \
        [--model efficientdet_d0] [--batch-size 8] [--out dets.json]
With no --image-dir, generates a few synthetic JPEGs to demonstrate.
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", default="")
    p.add_argument("--model", default="efficientdet_d0")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--checkpoint", default="",
                   help="orbax dir or reference .pth to load")
    p.add_argument("--score-threshold", type=float, default=0.1)
    p.add_argument("--ood-method", default="energy",
                   choices=["energy", "max_logit", "msp"])
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ood_object_detection_tpu.data import (
        NativeEvalLoader,
        native_decode_available,
        normalize_uint8,
    )
    from ood_object_detection_tpu.factory import create_model

    if args.image_dir:
        paths = sorted(
            sum((glob.glob(os.path.join(args.image_dir, e))
                 for e in ("*.jpg", "*.jpeg", "*.JPG", "*.png")), []))
        if not paths:
            raise SystemExit(f"no images under {args.image_dir}")
    else:
        from PIL import Image
        rng = np.random.default_rng(0)
        tmp = "/tmp/deploy_infer_demo"
        os.makedirs(tmp, exist_ok=True)
        paths = []
        for i in range(4):
            img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
            path = os.path.join(tmp, f"demo_{i}.jpg")
            Image.fromarray(img).save(path, quality=90)
            paths.append(path)
        print(f"# no --image-dir given; wrote {len(paths)} demo JPEGs to {tmp}")

    bench, variables = create_model(
        args.model, bench_task="predict", num_classes=args.num_classes,
        checkpoint_path=args.checkpoint,
        soft_nms=True, ood_method=args.ood_method,
        compute_dtype="bfloat16")
    h, w = bench.config.image_size

    if not native_decode_available():
        raise SystemExit("native data core unavailable (make -C csrc)")
    loader = NativeEvalLoader(paths, target_hw=(h, w),
                              batch_size=args.batch_size)

    @jax.jit
    def run(v, canvases):
        x = normalize_uint8(canvases)
        return bench.forward_with_ood(v, x)

    results = []
    for batch in loader:
        dets, ood = run(variables, batch["image"])
        dets = np.asarray(dets)
        ood = np.asarray(ood)
        for i, path in enumerate(batch["path"]):
            scale = float(batch["img_scale"][i])
            keep = dets[i, :, 4] >= args.score_threshold
            rows = dets[i, keep]
            results.append({
                "path": path,
                "detections": [
                    {"box_xyxy": [round(float(c) * scale, 2)
                                  for c in r[:4]],
                     "score": round(float(r[4]), 4),
                     "class": int(r[5]),
                     "ood_score": round(float(o), 4)}
                    for r, o in zip(rows, ood[i, keep])],
            })

    summary = {
        "images": len(results),
        "detections": sum(len(r["detections"]) for r in results),
        "backend": jax.default_backend(),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
