"""Quantify the top-k selection methods' detection-quality cost.

VERDICT r3 weak-#1: the headline throughput uses
``topk_method='per_anchor'`` + ``approx_max_k`` while bit-faithful parity
belongs to ``'exact'`` — this script measures what the deviation actually
costs. It trains EfficientDet-D0 on synthetic data (same recipe as
examples/open_set_demo.py), then evaluates ONE set of weights on ONE
held-out val set under all three selection methods (reference selection:
effdet/anchors.py top-k over (anchor, class) pairs), reporting PASCAL
mAP@0.5, COCO mAP@[.5:.95] and the per-image detection-set overlap vs
'exact'. Results are recorded in PARITY.md.

Run: python -m examples.selection_quality [--steps 500]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--num-classes", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--val-images", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.04)
    p.add_argument("--out", default="")
    p.add_argument("--save-outs", default="", help="dump val head outputs "
                   "to this .npz after the forward pass (crash isolation)")
    p.add_argument("--load-outs", default="", help="skip training; evaluate "
                   "selection methods on head outputs from this .npz")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_train_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ood_object_detection_tpu.config import get_efficientdet_config
    from ood_object_detection_tpu.config.train_config import TrainConfig
    from ood_object_detection_tpu.data import (
        SyntheticDetectionDataset,
        collate_batch,
        normalize_uint8,
    )
    from ood_object_detection_tpu.evaluation import PascalEvaluator
    from ood_object_detection_tpu.evaluation.coco_eval import CocoMeanAP
    from ood_object_detection_tpu.models import EfficientDet
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.ops.post_process import generate_detections
    from ood_object_detection_tpu.train import (
        create_train_state,
        make_train_step,
    )

    size = (args.image_size, args.image_size)
    cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=args.num_classes).replace(
        image_size=size)
    model = EfficientDet(cfg)
    anchors = Anchors.from_config(cfg)
    anchor_boxes = jnp.asarray(anchors.boxes)

    # held-out val set (seed disjoint from training)
    val_ds = SyntheticDetectionDataset(
        num_images=args.val_images, image_size=size,
        num_classes=args.num_classes, seed=101)
    val_batches = [collate_batch([val_ds[i + b]
                                  for b in range(args.batch_size)])
                   for i in range(0, args.val_images, args.batch_size)]

    if not args.load_outs:
        state, tx = create_train_state(
            model, TrainConfig(lr=args.lr), jax.random.key(0),
            lr_schedule=optax.linear_schedule(1e-4, args.lr, 100))
        step_fn = make_train_step(model, tx, anchors,
                                  TrainConfig(lr=args.lr), mesh=None)

        train_ds = SyntheticDetectionDataset(
            num_images=args.batch_size * 16, image_size=size,
            num_classes=args.num_classes, seed=0)
        rng = np.random.default_rng(0)
        print(json.dumps({"phase": "train", "steps": args.steps}))
        for i in range(args.steps):
            idxs = rng.integers(0, len(train_ds), args.batch_size)
            batch = collate_batch([train_ds[int(j)] for j in idxs])
            state, metrics = step_fn(state, {
                "image": normalize_uint8(jnp.asarray(batch["image"])),
                "bbox": jnp.asarray(batch["bbox"]),
                "cls": jnp.asarray(batch["cls"])})
            if (i + 1) % 100 == 0:
                print(json.dumps({"step": i + 1,
                                  "loss": float(metrics["loss"])}))
        jax.block_until_ready(state.params)
        print(json.dumps({"phase": "train_done"}))

        variables = state.variables(use_ema=False)

    @jax.jit
    def features(v, x):
        return model.apply(v, x, training=False)

    def detect_fn(method):
        @jax.jit
        def run(cls_out, box_out):
            dets, _ = generate_detections(
                list(cls_out), list(box_out), anchor_boxes,
                num_classes=cfg.num_classes,
                max_detection_points=cfg.max_detection_points,
                max_det_per_image=cfg.max_det_per_image,
                soft_nms=cfg.soft_nms, topk_method=method,
                topk_recall=cfg.topk_recall, anchors=anchors)
            return dets
        return run

    # forward once per batch; the selection methods reuse the head outputs.
    # Materialise on host: isolates forward-pass faults from post-process
    # faults (device→host sync surfaces async TPU errors) and lets
    # --save-outs capture the exact tensors for offline repro.
    if args.load_outs:
        z = np.load(args.load_outs)
        n_lvl, n_batch = int(z["n_lvl"]), int(z["n_batch"])
        outs = [(tuple(jnp.asarray(z[f"c{i}_{l}"]) for l in range(n_lvl)),
                 tuple(jnp.asarray(z[f"b{i}_{l}"]) for l in range(n_lvl)))
                for i in range(n_batch)]
    else:
        outs = []
        for b in val_batches:
            cls_out, box_out = features(
                variables, normalize_uint8(jnp.asarray(b["image"])))
            outs.append((tuple(np.asarray(t) for t in cls_out),
                         tuple(np.asarray(t) for t in box_out)))
        print(json.dumps({"phase": "forward_done"}))
        if args.save_outs:
            arrs = {"n_lvl": np.int32(len(outs[0][0])),
                    "n_batch": np.int32(len(outs))}
            for i, (c, bx) in enumerate(outs):
                for l in range(len(c)):
                    arrs[f"c{i}_{l}"] = c[l]
                    arrs[f"b{i}_{l}"] = bx[l]
            np.savez(args.save_outs, **arrs)
            print(json.dumps({"phase": "outs_saved", "path": args.save_outs}))
        outs = [(tuple(jnp.asarray(t) for t in c),
                 tuple(jnp.asarray(t) for t in bx)) for c, bx in outs]

    results = {}
    dets_by_method = {}
    for method in ("exact", "approx", "per_anchor"):
        print(json.dumps({"phase": "eval", "method": method}))
        run = detect_fn(method)
        pascal = PascalEvaluator(num_classes=args.num_classes)
        coco = CocoMeanAP(num_classes=args.num_classes)
        all_dets = []
        for (cls_out, box_out), b in zip(outs, val_batches):
            dets = np.asarray(run(cls_out, box_out))
            all_dets.append(dets)
            pascal.add_predictions(dets, {
                "bbox": b["bbox"], "cls": b["cls"], "img_id": b["img_id"]})
            for bi in range(dets.shape[0]):
                gt_keep = b["cls"][bi] > 0
                coco.add_image(
                    (len(coco._img_keys),),
                    dets[bi, :, :4], dets[bi, :, 4],
                    dets[bi, :, 5].astype(np.int32),
                    # GT is yxyx; dets are xyxy
                    b["bbox"][bi][gt_keep][:, [1, 0, 3, 2]],
                    b["cls"][bi][gt_keep])
        dets_by_method[method] = np.concatenate(all_dets, 0)
        coco_stats = coco.stats()
        results[method] = {
            "pascal_map50": round(
                float(pascal.evaluate()["mAP@0.5IOU"]), 5),
            "coco_map": round(coco_stats["map"], 5),
            "coco_map50": round(coco_stats["map50"], 5),
        }

    # detection-set agreement vs exact: fraction of exact's scoring
    # detections reproduced (same box to 1e-3, class, score to 1e-3)
    ref = dets_by_method["exact"]
    for method in ("approx", "per_anchor"):
        got = dets_by_method[method]
        n_ref = n_hit = 0
        for i in range(ref.shape[0]):
            rmask = ref[i, :, 4] > 0.01
            gmask = got[i, :, 4] > 0.01
            r, g = ref[i][rmask], got[i][gmask]
            n_ref += len(r)
            if not len(r) or not len(g):
                continue
            # row-wise nearest match
            d = (np.abs(r[:, None, :4] - g[None, :, :4]).max(-1)
                 + 1e3 * (r[:, None, 5] != g[None, :, 5])
                 + np.abs(r[:, None, 4] - g[None, :, 4]))
            n_hit += int((d.min(1) < 1e-3).sum())
        results[method]["overlap_vs_exact"] = round(n_hit / max(n_ref, 1), 5)

    for m in results:
        results[m]["delta_coco_map_vs_exact"] = round(
            results[m]["coco_map"] - results["exact"]["coco_map"], 5)
        results[m]["delta_pascal_vs_exact"] = round(
            results[m]["pascal_map50"] - results["exact"]["pascal_map50"], 5)

    line = json.dumps({"selection_quality": results,
                       "val_images": args.val_images,
                       "steps": args.steps})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return results


if __name__ == "__main__":
    main()
