"""Train-step roofline breakdown on the real chip (VERDICT r3 #6).

Decomposes the D0@512 train step (reference hot loop pretrain.py:207-276)
into its stages, times each with the LICM-proof device_time harness, and
prints XLA's own cost analysis (flops + HBM bytes accessed) for the full
step so the throughput number can be placed against the chip's roofline
(v5e: ~197 bf16 TFLOP/s MXU, ~819 GB/s HBM).

Usage:  python examples/train_roofline.py [--batch 128] [--model efficientdet_d0]
        [--freeze-bn none|backbone|all] [--iters 10]
Emits JSON lines, one per stage, then a summary roofline line.
"""
from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="efficientdet_d0")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--freeze-bn", default="none",
                    choices=["none", "backbone", "all"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", type=int, default=0,
                    help="backbone remat stages (0 = off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    from ood_object_detection_tpu.config import (
        default_detection_train_config, get_efficientdet_config)
    from ood_object_detection_tpu.models import EfficientDet
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.ops.losses import detection_loss_nhwc
    from ood_object_detection_tpu.ops.target_assigner import batch_label_anchors
    from ood_object_detection_tpu.train import (
        create_train_state, make_train_step)
    from ood_object_detection_tpu.utils.benchmark import device_time

    cfg = get_efficientdet_config(args.model, num_classes=90).replace(
        compute_dtype=args.dtype)
    if args.remat:
        cfg = cfg.replace(backbone_args={**(cfg.backbone_args or {}),
                                         "remat_stages": args.remat})
    model = EfficientDet(cfg)
    anchors = Anchors.from_config(cfg)
    anchor_boxes = jnp.asarray(anchors.boxes)
    tcfg = default_detection_train_config()
    state, tx = create_train_state(model, tcfg, jax.random.key(0))
    bs = args.batch
    h, w = cfg.image_size

    rng = np.random.default_rng(0)
    m = 16
    yx = rng.uniform(0, h - 64, (bs, m, 2)).astype(np.float32)
    hw_box = rng.uniform(16, 64, (bs, m, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(
            rng.normal(0, 1, (bs, h, w, 3)).astype(np.float32)),
        "bbox": jnp.asarray(np.concatenate([yx, yx + hw_box], -1)),
        "cls": jnp.asarray(rng.integers(1, 90, (bs, m)).astype(np.int32)),
    }

    bb_training = args.freeze_bn == "none"
    rest_training = args.freeze_bn != "all"

    def forward(m_, x):
        feats = m_.backbone(x, bb_training)
        activs = m_.fpn(feats, rest_training)
        return m_.heads(activs, rest_training)

    def fwd_only(params, batch_stats, image):
        (cls_out, box_out), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, image,
            method=forward, mutable=["batch_stats"])
        return (sum(jnp.sum(c.astype(jnp.float32)) for c in cls_out)
                + sum(jnp.sum(b.astype(jnp.float32)) for b in box_out))

    def loss_of(params, batch_stats, image, labels):
        (cls_out, box_out), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, image,
            method=forward, mutable=["batch_stats"])
        total, _, _ = detection_loss_nhwc(
            cls_out, box_out, labels.cls_targets, labels.box_targets,
            labels.num_positives, num_classes=cfg.num_classes,
            alpha=cfg.alpha, gamma=cfg.gamma, delta=cfg.delta,
            box_loss_weight=cfg.box_loss_weight,
            label_smoothing=cfg.label_smoothing,
            legacy_focal=cfg.legacy_focal,
            focal_modulation=cfg.focal_modulation,
            remat_cls=tcfg.remat_cls_loss)
        return total

    labels0 = jax.jit(lambda ab, bb, cl: batch_label_anchors(
        ab, bb, cl, impl="auto"))(anchor_boxes, batch["bbox"], batch["cls"])
    labels0 = jax.block_until_ready(labels0)

    def labeling(bbox, cls):
        lab = batch_label_anchors(anchor_boxes, bbox, cls, impl="auto")
        return jnp.sum(lab.num_positives).astype(jnp.float32)

    def fwd_bwd(params, batch_stats, image, labels):
        loss, grads = jax.value_and_grad(loss_of)(
            params, batch_stats, image, labels)
        return loss + optax.global_norm(grads) * 1e-30

    def opt_update(grads, opt_state, params, ema):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        dep = optax.global_norm(new_params) * 1e-30
        if ema is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * 0.9998 + p * 0.0002, ema, new_params)
            dep = dep + optax.global_norm(new_ema) * 1e-30
        leaves = jax.tree.leaves(new_opt)
        dep = dep + sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                        if hasattr(l, "dtype")
                        and jnp.issubdtype(l.dtype, jnp.floating)) * 1e-30
        return dep

    grads0 = jax.jit(jax.grad(loss_of))(
        state.params, state.batch_stats, batch["image"], labels0)
    grads0 = jax.block_until_ready(grads0)

    step = make_train_step(model, tx, anchors, tcfg, donate=False,
                           freeze_bn=args.freeze_bn)

    def full(s, b):
        ns, metrics = step(s, b)
        dep = optax.global_norm(ns.params) * 1e-30
        if ns.ema_params is not None:
            dep = dep + optax.global_norm(ns.ema_params) * 1e-30
        return metrics["loss"].astype(jnp.float32) + dep

    stages = {}
    it = args.iters

    stages["labeling"] = device_time(
        labeling, (batch["bbox"], batch["cls"]), iters=it)
    stages["forward"] = device_time(
        fwd_only, (state.params, state.batch_stats, batch["image"]), iters=it)
    stages["fwd_bwd"] = device_time(
        fwd_bwd, (state.params, state.batch_stats, batch["image"], labels0),
        iters=it)
    stages["optimizer_ema"] = device_time(
        opt_update, (grads0, state.opt_state, state.params,
                     state.ema_params), iters=it)
    stages["full_step"] = device_time(full, (state, batch), iters=it)

    for name, t in stages.items():
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 2),
                          "img_per_s": round(bs / t, 1)}))

    # XLA's own cost model for the compiled full step: flops + bytes accessed
    lowered = jax.jit(full).lower(state, batch)
    compiled = lowered.compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    t_full = stages["full_step"]
    out = {
        "model": args.model, "batch": bs, "dtype": args.dtype,
        "freeze_bn": args.freeze_bn, "remat": args.remat,
        "full_step_ms": round(t_full * 1e3, 2),
        "img_per_s": round(bs / t_full, 1),
        "xla_flops": flops, "xla_bytes_accessed": bytes_acc,
        "achieved_tflops": round(flops / t_full / 1e12, 2),
        "achieved_GBps": round(bytes_acc / t_full / 1e9, 1),
        "hbm_bound_time_ms_at_819GBps": round(bytes_acc / 819e9 * 1e3, 2),
        "mxu_bound_time_ms_at_197TFLOPs": round(flops / 197e12 * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
