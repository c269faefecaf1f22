"""Supervised detector pre-training driver (the pretrain.py capability).

Equivalent of the reference pretrain.py:68-406 — focal+huber training on a
detection dataset with interleaved validation, best-val checkpointing,
per-category metric dumps — redesigned for TPU:

* one jitted SPMD train step (batch sharded over the mesh's data axis,
  on-device anchor labeling, grad-clip, EMA) instead of a Python hot loop
  with host-side labeling workers;
* asynchronous host evaluation (the reference blocks the GPU on its numpy
  evaluator every step, pretrain.py:244-251);
* orbax checkpoints carrying optimizer state + step (true resume — the
  reference can only reload weights, SURVEY §5.4).

Run: python -m ood_object_detection_tpu.train.pretrain --help
"""
from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", default="test")
    p.add_argument("--model", default="efficientdet_d0")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--fpn-repeats", type=int, default=None,
                   help="override fpn_cell_repeats (smoke tests)")
    p.add_argument("--head-repeats", type=int, default=None,
                   help="override box_class_repeats (smoke tests)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.09)
    p.add_argument("--warmup-steps", type=int, default=200)
    p.add_argument("--clip-grad", type=float, default=10.0)
    p.add_argument("--ema-decay", type=float, default=0.9998)
    p.add_argument("--val-freq", type=int, default=50)
    p.add_argument("--val-steps", type=int, default=4)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--alpha", type=float, default=0.15)
    p.add_argument("--gamma", type=float, default=0.0)
    p.add_argument("--bbox-coeff", type=float, default=50.0)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or a COCO annotation JSON path")
    p.add_argument("--data-dir", default="", help="image dir for COCO data")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--eval-map", action="store_true",
                   help="run the PASCAL evaluator on val batches")
    p.add_argument("--per-cat-dir", default="per_cat_metrics")
    p.add_argument("--mesh", type=int, default=-1,
                   help="#devices on the data axis (-1 = all)")
    return p


def make_loaders(args, model_cfg):
    from ..data import (
        CocoParser,
        DetectionDataset,
        PrefetchLoader,
        SyntheticDetectionDataset,
        transforms_coco_eval,
        transforms_coco_train,
    )

    size = model_cfg.image_size
    if args.data == "synthetic":
        train_ds = SyntheticDetectionDataset(
            num_images=max(args.batch_size * 16, 256), image_size=size,
            num_classes=model_cfg.num_classes, seed=0)
        val_ds = SyntheticDetectionDataset(
            num_images=args.batch_size * args.val_steps, image_size=size,
            num_classes=model_cfg.num_classes, seed=1)
    else:
        parser = CocoParser(args.data)
        train_ds = DetectionDataset(
            args.data_dir, parser, transforms_coco_train(size))
        val_ds = DetectionDataset(
            args.data_dir, parser, transforms_coco_eval(size))

    train = PrefetchLoader(train_ds, args.batch_size, shuffle=True,
                           workers=args.workers, device_put=True)
    val = PrefetchLoader(val_ds, args.batch_size, shuffle=False,
                         workers=args.workers, device_put=True)
    return train, val


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..config import get_efficientdet_config
    from ..config.train_config import TrainConfig
    from ..evaluation import PascalEvaluator
    from ..models import EfficientDet
    from ..ops.anchors import Anchors
    from ..parallel import create_mesh, shard_batch
    from .checkpoint import CheckpointManager
    from .train_state import (
        create_train_state,
        detection_eval_step,
        make_train_step,
    )

    model_cfg = get_efficientdet_config(
        args.model, num_classes=args.num_classes,
        alpha=args.alpha, gamma=args.gamma, box_loss_weight=args.bbox_coeff)
    if args.image_size:
        model_cfg = model_cfg.replace(
            image_size=(args.image_size, args.image_size))
    if args.fpn_repeats:
        model_cfg = model_cfg.replace(fpn_cell_repeats=args.fpn_repeats)
    if args.head_repeats:
        model_cfg = model_cfg.replace(box_class_repeats=args.head_repeats)

    tcfg = TrainConfig(
        lr=args.lr, clip_grad_norm=args.clip_grad, ema_decay=args.ema_decay,
        batch_size=args.batch_size, checkpoint_dir=args.checkpoint_dir)

    model = EfficientDet(model_cfg)
    anchors = Anchors.from_config(model_cfg)
    mesh = create_mesh((args.mesh,), ("data",))
    print(f"mesh: {mesh.shape} devices={jax.device_count()}")

    schedule = optax.linear_schedule(1e-4, args.lr, args.warmup_steps)
    state, tx = create_train_state(model, tcfg, jax.random.key(0),
                                   lr_schedule=schedule)
    step_fn = make_train_step(model, tx, anchors, tcfg, mesh=mesh,
                              donate=True)
    anchor_boxes = jnp.asarray(anchors.boxes)
    eval_fn = jax.jit(lambda s, b: detection_eval_step(
        model, anchor_boxes, s, b))

    ckpt = CheckpointManager(args.checkpoint_dir, keep=3)
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")

    train_loader, val_loader = make_loaders(args, model_cfg)
    evaluator = PascalEvaluator(model_cfg.num_classes) if args.eval_map else None
    os.makedirs(args.per_cat_dir, exist_ok=True)

    metrics_acc = defaultdict(float)
    best_val = float("inf")
    step = start_step
    t0 = time.time()
    train_iter = iter(train_loader)

    while step < args.steps:
        try:
            batch = next(train_iter)
        except StopIteration:
            train_iter = iter(train_loader)
            batch = next(train_iter)
        batch = {k: batch[k] for k in ("image", "bbox", "cls")}
        batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch)
        step += 1
        for k, v in metrics.items():
            metrics_acc[k] += float(v)

        if step % args.log_freq == 0:
            avg = {k: v / args.log_freq for k, v in metrics_acc.items()}
            rate = args.batch_size * args.log_freq / (time.time() - t0)
            print(json.dumps({"step": step, "img_per_sec": round(rate, 1),
                              **{k: round(v, 5) for k, v in avg.items()}}))
            metrics_acc = defaultdict(float)
            t0 = time.time()

        if step % args.val_freq == 0:
            val_losses = []
            for vi, vbatch in enumerate(val_loader):
                if vi >= args.val_steps:
                    break
                vm = eval_fn(state, {k: vbatch[k]
                                     for k in ("image", "bbox", "cls")})
                val_losses.append(float(vm["loss"]))
            val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
            print(json.dumps({"step": step, "val_loss": round(val_loss, 5)}))
            if val_loss < best_val:
                best_val = val_loss
                ckpt.save(step, state, metrics={"val_loss": val_loss})
                print(json.dumps({"step": step, "saved_best": best_val}))
            if evaluator is not None:
                res = evaluator.evaluate()
                np.save(os.path.join(
                    args.per_cat_dir, f"{args.exp}_ap_{step}.npy"),
                    res["per_class_ap"])

    ckpt.save(step, state)
    ckpt.wait()
    print(json.dumps({"final_step": step, "best_val": best_val}))


if __name__ == "__main__":
    main()
