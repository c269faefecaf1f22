"""Open-set OOD demo: train on known classes, score unknowns with energy.

The BASELINE 'open-set eval' configuration end-to-end on synthetic data:
train EfficientDet on known classes only, then run the predict bench with
per-detection energy scores over images containing known vs unknown-class
objects and report AUROC / FPR95.

Run: python -m examples.open_set_demo [--steps 500]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--known-classes", type=int, default=4)
    p.add_argument("--unknown-classes", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.04)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ood_object_detection_tpu.bench import DetBenchPredict
    from ood_object_detection_tpu.config import get_efficientdet_config
    from ood_object_detection_tpu.config.train_config import TrainConfig
    from ood_object_detection_tpu.data import (
        SyntheticDetectionDataset,
        collate_batch,
        normalize_uint8,
    )
    from ood_object_detection_tpu.evaluation import OodEvaluator
    from ood_object_detection_tpu.models import EfficientDet
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.train import (
        create_train_state,
        make_train_step,
    )

    k = args.known_classes
    size = (args.image_size, args.image_size)
    cfg = get_efficientdet_config(
        "efficientdet_d0", num_classes=k).replace(image_size=size)
    model = EfficientDet(cfg)
    anchors = Anchors.from_config(cfg)
    tcfg = TrainConfig(lr=args.lr)
    state, tx = create_train_state(
        model, tcfg, jax.random.key(0),
        lr_schedule=optax.linear_schedule(1e-4, args.lr, 100))
    step_fn = make_train_step(model, tx, anchors, tcfg, mesh=None)

    # known-class training data: classes 1..k of a (k+u)-class color table
    total = k + args.unknown_classes
    train_ds = SyntheticDetectionDataset(
        num_images=args.batch_size * 16, image_size=size, num_classes=total,
        seed=0)

    def batch_of(classes_keep, seed, n):
        ds = SyntheticDetectionDataset(
            num_images=512, image_size=size, num_classes=total, seed=seed)
        samples = []
        i = 0
        while len(samples) < n and i < 512:
            img, anno = ds[i]
            i += 1
            if set(np.unique(anno["cls"])) <= set(classes_keep):
                samples.append((img, anno))
        return collate_batch(samples)

    rng = np.random.default_rng(0)
    known_cls = list(range(1, k + 1))
    unknown_cls = list(range(k + 1, total + 1))

    print(json.dumps({"phase": "train", "steps": args.steps}))
    i = 0
    while i < args.steps:
        idxs = rng.integers(0, len(train_ds), args.batch_size)
        samples = [train_ds[int(j)] for j in idxs]
        # drop unknown-class instances from training labels
        for _, anno in samples:
            keep = np.isin(anno["cls"], known_cls)
            anno["bbox"], anno["cls"] = anno["bbox"][keep], anno["cls"][keep]
        batch = collate_batch(samples)
        state, metrics = step_fn(state, {
            "image": normalize_uint8(jnp.asarray(batch["image"])),
            "bbox": jnp.asarray(batch["bbox"]),
            "cls": jnp.asarray(batch["cls"])})
        i += 1
        if i % 100 == 0:
            print(json.dumps({"step": i, "loss": float(metrics["loss"])}))

    bench = DetBenchPredict(model, ood_method="energy")
    fwd = jax.jit(lambda v, x: bench.forward_with_ood(v, x))
    variables = state.variables(use_ema=False)

    # GT-region energies: for every GT instance, the energy of its
    # best-IoU anchor. Unlike detection-level scores this never comes up
    # empty, so the ROC is always real.
    from ood_object_detection_tpu.ops.boxes import pairwise_iou_yxyx
    from ood_object_detection_tpu.ops.post_process import _per_anchor_reduce

    anchor_boxes = jnp.asarray(bench.anchors.boxes)

    @jax.jit
    def gt_region_energies(v, images, bbox, cls):
        cls_out, _ = model.apply(v, images, training=False)
        _, _, ood_all = _per_anchor_reduce(cls_out, cfg.num_classes,
                                           ood_method="energy")

        def one(ood_row, boxes, classes):
            iou = pairwise_iou_yxyx(boxes, anchor_boxes)     # [M, A]
            idx = jnp.argmax(iou, axis=1)
            return ood_row[idx], classes > 0

        return jax.vmap(one)(ood_all, bbox, cls)

    det_ev = OodEvaluator()
    gt_ev = OodEvaluator()
    for is_known, classes, seed in ((True, known_cls, 7), (False, unknown_cls, 8)):
        batch = batch_of(classes, seed, 16)
        images = normalize_uint8(jnp.asarray(batch["image"]))
        dets, ood = fwd(variables, images)
        dets, ood = np.asarray(dets), np.asarray(ood)
        valid = dets[..., 4] > 0.02      # low threshold: include weak hits
        scores = ood[valid]
        det_ev.add_predictions(scores,
                               {"is_known": np.full(len(scores), is_known)})

        e, e_valid = gt_region_energies(
            variables, images, jnp.asarray(batch["bbox"]),
            jnp.asarray(batch["cls"]))
        gt_scores = np.asarray(e)[np.asarray(e_valid)]
        gt_ev.add_predictions(
            gt_scores, {"is_known": np.full(len(gt_scores), is_known)})
        print(json.dumps({
            "set": "known" if is_known else "unknown",
            "detections": int(valid.sum()),
            "gt_instances": int(len(gt_scores)),
            "mean_energy": float(scores.mean()) if len(scores) else None,
            "mean_gt_energy": float(gt_scores.mean())
            if len(gt_scores) else None}))

    gt_res = gt_ev.evaluate()
    out = {"auroc_gt_regions": round(gt_res["auroc"], 4),
           "fpr95_gt_regions": round(gt_res["fpr95"], 4)}
    det_res = det_ev.evaluate()
    if np.isnan(det_res["auroc"]):
        out["auroc_detections"] = None
        out["note"] = ("one side produced no detections above threshold; "
                       "detection-level ROC undefined — use the GT-region "
                       "numbers")
    else:
        out["auroc_detections"] = round(det_res["auroc"], 4)
        out["fpr95_detections"] = round(det_res["fpr95"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
