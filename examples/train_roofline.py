"""Roofline analysis of the detection train step (VERDICT r3 #6).

Builds the same jitted train step as ``bench.py`` BENCH_MODE=train
(reference hot loop: pretrain.py:207-276), then reports

* XLA's compiled cost analysis: total FLOPs and HBM bytes accessed
  per step (the compiler's own estimate of the memory traffic the
  schedule actually issues, post-fusion),
* the measured step time (same device_time harness as bench.py),
* the roofline decomposition: time lower-bound if purely HBM-bound
  (bytes / peak BW) vs purely compute-bound (FLOPs / peak bf16), and
  the achieved fraction of each.

Peak numbers default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM) and
can be overridden with ROOFLINE_PEAK_TFLOPS / ROOFLINE_PEAK_GBS for
other chips.

Usage:  python examples/train_roofline.py [--batch 128] [--model
efficientdet_d0] [--dtype bfloat16] [--freeze-bn none] [--profile-dir D]

``--task predict`` rooflines the end-to-end inference path instead
(fused preproc + forward + soft-NMS + energy OOD — the same graph as
bench.py's north-star row), backing the README's D4@1024 HBM-bound
claim with a committed artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="efficientdet_d0")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--freeze-bn", default="none",
                    choices=["none", "backbone", "all"])
    ap.add_argument("--remat", type=int, default=0,
                    help="gradient-checkpoint the first N backbone stages "
                         "(same knob as bench.py BENCH_REMAT)")
    ap.add_argument("--remat-fpn-heads", action="store_true",
                    help="also gradient-checkpoint the FPN cells and heads "
                         "(config remat_fpn/remat_heads; required for "
                         "D4@1024 train at bs>=16 — ROOFLINE.json OOM rows)")
    ap.add_argument("--task", default="train", choices=["train", "predict"],
                    help="train = full train step (default); predict = "
                         "end-to-end inference (preproc+fwd+softNMS+OOD, "
                         "bench.py north-star graph)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile-dir", default="",
                    help="also capture a jax.profiler trace here")
    ap.add_argument("--skip-measure", action="store_true",
                    help="cost analysis only (no timed run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # share bench.py's persistent compile cache: reruns skip compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ood_object_detection_tpu.config import (
        default_detection_train_config, get_efficientdet_config)
    from ood_object_detection_tpu.models import EfficientDet
    from ood_object_detection_tpu.ops.anchors import Anchors
    from ood_object_detection_tpu.train import (
        create_train_state, make_train_step)
    from ood_object_detection_tpu.utils.benchmark import device_time

    rng = np.random.default_rng(0)
    if args.task == "predict":
        # the bench.py north-star graph: uint8 canvases -> fused
        # letterbox+normalize -> forward -> soft-NMS -> energy OOD
        from ood_object_detection_tpu.data import batched_letterbox_normalize
        from ood_object_detection_tpu.factory import create_model

        bench, variables = create_model(
            args.model, bench_task="predict", num_classes=90,
            soft_nms=True, ood_method="energy", compute_dtype=args.dtype)
        h, w = bench.config.image_size
        canvases = jnp.asarray(rng.integers(
            0, 255, (args.batch, h, w, 3)).astype(np.uint8))
        true_hw = jnp.asarray(rng.integers(
            h // 2, h, (args.batch, 2)).astype(np.int32))

        def full(v, cv, hw):
            pre = batched_letterbox_normalize(cv, hw, target_hw=(h, w),
                                              out_dtype=args.dtype)
            return bench.forward_with_ood(v, pre["image"])[0]

        step = jax.jit(full)
        step_args = (variables, canvases, true_hw)
    else:
        cfg = get_efficientdet_config(args.model, num_classes=90).replace(
            compute_dtype=args.dtype)
        if args.remat:
            cfg = cfg.replace(backbone_args={**(cfg.backbone_args or {}),
                                             "remat_stages": args.remat})
        if args.remat_fpn_heads:
            cfg = cfg.replace(remat_fpn=True, remat_heads=True)
        model = EfficientDet(cfg)
        anchors = Anchors.from_config(cfg)
        tcfg = default_detection_train_config()
        state, tx = create_train_state(model, tcfg, jax.random.key(0))
        step = make_train_step(model, tx, anchors, tcfg, donate=False,
                               freeze_bn=args.freeze_bn)

        h, w = cfg.image_size
        m = 16
        yx = rng.uniform(0, h - 64, (args.batch, m, 2)).astype(np.float32)
        hw_box = rng.uniform(16, 64, (args.batch, m, 2)).astype(np.float32)
        batch = {
            "image": jnp.asarray(rng.normal(0, 1, (args.batch, h, w, 3))
                                 .astype(np.float32)),
            "bbox": jnp.asarray(np.concatenate([yx, yx + hw_box], -1)),
            "cls": jnp.asarray(rng.integers(1, 90, (args.batch, m))
                               .astype(np.int32)),
        }
        step_args = (state, batch)

    compiled = step.lower(*step_args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax: one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    # memory traffic split (present on most backends)
    detail = {k: v for k, v in ca.items()
              if isinstance(v, (int, float)) and "bytes accessed" in k}

    peak_tflops = float(os.environ.get("ROOFLINE_PEAK_TFLOPS", "197"))
    peak_gbs = float(os.environ.get("ROOFLINE_PEAK_GBS", "819"))

    out = {
        "model": args.model, "task": args.task, "batch": args.batch,
        "dtype": args.dtype,
        "freeze_bn": args.freeze_bn, "remat": args.remat,
        "remat_fh": int(args.remat_fpn_heads),
        "flops_per_step": flops,
        "hbm_bytes_per_step": bytes_accessed,
        "hbm_gb_per_image": bytes_accessed / args.batch / 1e9,
        "t_compute_bound_ms": flops / (peak_tflops * 1e12) * 1e3,
        "t_hbm_bound_ms": bytes_accessed / (peak_gbs * 1e9) * 1e3,
    }

    if not args.skip_measure:
        if args.task == "predict":
            timed = lambda *a: step(*a)  # noqa: E731 — output is the dets
        else:
            import optax

            def timed(s, b):
                ns, metrics = step(s, b)
                dep = optax.global_norm(ns.params) * 1e-30
                if ns.ema_params is not None:
                    dep = dep + optax.global_norm(ns.ema_params) * 1e-30
                return metrics["loss"].astype(jnp.float32) + dep

        t = device_time(timed, step_args, iters=args.iters)
        out["t_measured_ms"] = t * 1e3
        out["images_per_sec"] = args.batch / t
        out["hbm_bw_utilization"] = out["t_hbm_bound_ms"] / out["t_measured_ms"]
        out["mxu_utilization"] = out["t_compute_bound_ms"] / out["t_measured_ms"]
        out["arithmetic_intensity_flops_per_byte"] = (
            flops / bytes_accessed if bytes_accessed else float("nan"))

    if args.profile_dir:
        # profiling needs no timed run, so it is independent of
        # --skip-measure (advisor r4: flag was silently ignored)
        jax.profiler.start_trace(args.profile_dir)
        res = None
        for _ in range(3):
            res = step(*step_args)
        jax.block_until_ready(res)
        jax.profiler.stop_trace()
        out["profile_dir"] = args.profile_dir

    print(json.dumps(out, indent=2))
    if detail:
        print(json.dumps({"bytes_accessed_detail": detail}, indent=2))


if __name__ == "__main__":
    main()
