"""Offline evaluation driver: checkpoint + dataset -> detection metrics.

The reference evaluates only inside its training loops (pretrain.py:241-257,
infer.py:689-700); the upstream-effdet capability it was derived from has a
standalone ``validate.py``. This is that capability, TPU-native: the fused
predict graph (optionally sharded data-parallel over every local device via
``DetBenchPredict.sharded``) streams a val split through the asynchronous
evaluator — the device never blocks on the host numpy evaluation — and one
JSON metrics line is printed at the end.

Run::

    python -m ood_object_detection_tpu.validate \\
        --model efficientdet_d0 --checkpoint model.pth \\
        --dataset coco2017 --data /datasets/coco [--evaluator coco]

``--checkpoint`` accepts a reference-format torch ``.pth``/``.pt`` (with
``--checkpoint-ema`` for EMA weights) or an orbax variables dir; with no
checkpoint the randomly-initialized model is evaluated (pipeline smoke).
``--data synthetic`` needs no files at all.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="efficientdet_d0")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--checkpoint", default="",
                   help="torch .pth/.pt or orbax variables dir")
    p.add_argument("--checkpoint-ema", action="store_true",
                   help="load EMA weights from torch checkpoints "
                        "(reference use_ema, factory.py:46-47)")
    p.add_argument("--dataset", default="",
                   help="named dataset (coco2017, voc0712, openimages, ...)")
    p.add_argument("--data", default="synthetic",
                   help="dataset root / COCO json / 'synthetic'")
    p.add_argument("--data-dir", default="", help="image dir for COCO json")
    p.add_argument("--split", default="val")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-batches", type=int, default=0,
                   help="stop after N batches (0 = whole split)")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--evaluator", default="",
                   help="pascal | weighted_pascal | precision_at_recall | "
                        "openimages | coco (default: by dataset)")
    p.add_argument("--ood-method", default="",
                   help="also score detections: energy | max_logit | msp")
    p.add_argument("--topk-method", default="per_anchor",
                   choices=["per_anchor", "approx", "exact"],
                   help="candidate top-k selection: per_anchor (fastest), "
                        "approx (reference pair semantics, approximate), "
                        "exact (bit-faithful reference selection) — "
                        "measured mAP deltas are in PARITY.md")
    p.add_argument("--topk-recall", type=float, default=0.95,
                   help="approx_max_k recall target for the approximate "
                        "selection methods")
    p.add_argument("--image-size", type=int, default=0)
    p.add_argument("--interpolation", default=None)
    p.add_argument("--mean", type=float, nargs="+", default=None)
    p.add_argument("--std", type=float, nargs="+", default=None)
    p.add_argument("--fill-color", default=None)
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel devices (0 = all local devices that "
                        "divide the batch)")
    p.add_argument("--out", default="", help="write the metrics JSON here")
    return p


def make_val_loader(args, model_cfg):
    from .data import (
        CocoParser,
        DetectionDataset,
        PrefetchLoader,
        SyntheticDetectionDataset,
        resolve_input_config,
        transforms_coco_eval,
    )

    icfg = resolve_input_config(args, model_cfg)
    size = icfg["image_size"]
    if args.dataset:
        from .data.dataset_factory import create_dataset, eval_flag_kwargs
        ds = create_dataset(args.dataset, args.data, splits=args.split,
                            **eval_flag_kwargs(args.dataset))
        ds.transform = transforms_coco_eval(
            size, interpolation=icfg["interpolation"],
            fill_color=icfg["fill_color"])
    elif args.data == "synthetic":
        ds = SyntheticDetectionDataset(
            num_images=args.batch_size * max(args.max_batches, 4),
            image_size=size, num_classes=model_cfg.num_classes, seed=1)
    else:
        ds = DetectionDataset(
            args.data_dir, CocoParser(args.data),
            transforms_coco_eval(size, interpolation=icfg["interpolation"],
                                 fill_color=icfg["fill_color"]))
    # drop_last=False: evaluation must cover the WHOLE split — the
    # training default would silently exclude the final partial batch
    # (e.g. 6 of VOC2007-val's 2510 images at bs=8)
    return PrefetchLoader(ds, args.batch_size, shuffle=False,
                          workers=args.workers, device_put=True,
                          drop_last=False,
                          mean=icfg["mean"], std=icfg["std"])


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jax_train_compilation_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from .evaluation import create_evaluator
    from .factory import create_model

    overrides = {}
    if args.image_size:
        overrides["image_size"] = (args.image_size, args.image_size)
    bench, variables = create_model(
        args.model, bench_task="predict", num_classes=args.num_classes,
        checkpoint_path=args.checkpoint, checkpoint_ema=args.checkpoint_ema,
        ood_method=args.ood_method or None,
        topk_method=args.topk_method, topk_recall=args.topk_recall,
        **overrides)

    loader = make_val_loader(args, bench.config)

    n_dev = jax.device_count()
    mesh_n = args.mesh or (n_dev if args.batch_size % n_dev == 0 else 1)
    jit_predict = bench.jit()
    if mesh_n > 1:
        from .parallel import create_mesh
        mesh = create_mesh((mesh_n,), ("data",))
        sharded_predict = bench.sharded(mesh)

        def predict(variables, x):
            # the split's final partial batch may not divide the mesh —
            # run it single-device rather than drop it
            if x.shape[0] % mesh_n:
                return jit_predict(variables, x)
            return sharded_predict(variables, x)
    else:
        predict = jit_predict

    from .evaluation import default_evaluator_name
    eval_name = args.evaluator or default_evaluator_name(args.dataset)
    evaluator = create_evaluator(eval_name, bench.config.num_classes)

    n_images = 0
    ood_acc = []
    t0 = time.time()
    for i, batch in enumerate(loader):
        if args.max_batches and i >= args.max_batches:
            break
        out = predict(variables, batch["image"])
        dets, ood = out if args.ood_method else (out, None)
        target = {k: batch[k]
                  for k in ("bbox", "cls", "img_id", "difficult", "group_of")
                  if k in batch}
        evaluator.add_predictions_async(dets, target)
        if ood is not None:
            d = np.asarray(dets)
            o = np.asarray(ood)
            kept = d[..., 4] > 0
            if kept.any():
                ood_acc.append(o[kept])
        n_images += int(batch["image"].shape[0])
    evaluator.drain()
    res = evaluator.evaluate()

    metrics = {k: round(float(v), 5) for k, v in res.items()
               if np.ndim(v) == 0}
    metrics["images"] = n_images
    metrics["img_per_sec"] = round(n_images / max(time.time() - t0, 1e-9), 2)
    if ood_acc:
        allo = np.concatenate(ood_acc)
        metrics["ood_mean"] = round(float(allo.mean()), 5)
        metrics["ood_p95"] = round(float(np.percentile(allo, 95)), 5)
    line = json.dumps(metrics)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return metrics


if __name__ == "__main__":
    main()
