"""Episodic meta-training / open-set adaptation driver (infer.py capability).

Equivalent of the reference infer.py:102-866 two-phase run: projection
pretraining episodes, then MAML meta-training with per-episode mAP/CorLoc
evaluation, meta-batch accumulation, best-val checkpointing of the class
head + projection net.

Run: python -m ood_object_detection_tpu.meta.train_driver --help
(defaults drive the synthetic episode source; point --coco-ann/--data-dir
at a dataset for real runs).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", default="meta")
    p.add_argument("--model", default="efficientdet_d0")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--qry-img-size", type=int, default=640)
    p.add_argument("--n-way", type=int, default=1)
    p.add_argument("--num-sup", type=int, default=25)
    p.add_argument("--num-qry", type=int, default=25)
    p.add_argument("--num-zero-images", type=int, default=6)
    p.add_argument("--meta-batch-size", type=int, default=4)
    p.add_argument("--proj-iters", type=int, default=10000)
    p.add_argument("--steps", type=int, default=1, help="inner steps")
    p.add_argument("--inner-lr", type=float, default=0.1)
    p.add_argument("--meta-lr", type=float, default=0.001)
    p.add_argument("--meta-clip", type=float, default=10.0)
    p.add_argument("--separate-head", action="store_true",
                   help="second pointwise class-predict head: support BCE "
                        "on its logits, gating on the main head's, main "
                        "predict pw frozen in the inner loop, meta groups "
                        "sep-at-meta_lr / rest staged (reference "
                        "--separate_head, infer.py:203-204,259-274,560)")
    p.add_argument("--learn-inner", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="meta-train the per-layer inner LRs (enabled at "
                        "--lr-stage-step like the reference, "
                        "infer.py:280-282,815-818)")
    p.add_argument("--lr-lr", type=float, default=None,
                   help="constant meta-LR for the inner-LR group, "
                        "overriding the staged enable")
    p.add_argument("--lr-stage-step", type=int, default=61,
                   help="meta updates before the staged groups switch "
                        "from 0 to --meta-lr (reference fires after 61, "
                        "infer.py:815-818)")
    p.add_argument("--only-final", action="store_true",
                   help="inner loop adapts only the predict pointwise "
                        "params (reference only_final, infer.py:663)")
    p.add_argument("--multi-inner", action=argparse.BooleanOptionalAction,
                   default=True, help="per-layer inner LRs")
    p.add_argument("--freeze-bb-bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="backbone BNs eval-mode in episodes; --no-* runs "
                        "them on batch stats (infer.py:323-337)")
    p.add_argument("--freeze-fpn-bn", action=argparse.BooleanOptionalAction,
                   default=True, help="FPN BN mode (see --freeze-bb-bn)")
    p.add_argument("--freeze-box-bn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="box-head BN mode (see --freeze-bb-bn)")
    p.add_argument("--train-bb", action="store_true",
                   help="meta-grads flow into backbone features "
                        "(infer.py:344-345)")
    p.add_argument("--train-fpn", action="store_true",
                   help="meta-grads flow into FPN features "
                        "(infer.py:347-348)")
    p.add_argument("--sim-thresh", type=float, default=0.2)
    p.add_argument("--sim-target", default="max", choices=["max", "avg"])
    p.add_argument("--loss-mode", default="separate",
                   choices=["separate", "same", "no_conf"])
    p.add_argument("--proj-depth", type=int, default=2)
    p.add_argument("--proj-size", type=int, default=512)
    p.add_argument("--proj-coeff", type=float, default=30.0)
    p.add_argument("--obj-coeff", type=float, default=0.0001)
    p.add_argument("--proj-reg", type=float, default=0.03)
    p.add_argument("--random-trans", action="store_true",
                   help="jitter+flip train-query transforms instead of "
                        "letterbox-only (reference random_trans, "
                        "dataloader.py:58-61)")
    p.add_argument("--supp-aug", action="store_true",
                   help="augment train supports with (0.8, 1.5) scale "
                        "jitter + flip (reference supp_aug, "
                        "dataloader.py:114-115)")
    p.add_argument("--ref-pos-enc", action="store_true",
                   help="reference-exact anchor positional encodings: "
                        "interleaved cell encoding + [feat|anch|lev|cell] "
                        "row layout (infer.py:370-377); default is the "
                        "clean concat(enc_y, enc_x) form")
    p.add_argument("--ref-stale-proj-activs", action="store_true",
                   help="reference-exact phase-B projection regularizer: "
                        "re-embed the LAST phase-A episode's activations "
                        "instead of the current episode's proj crops "
                        "(infer.py:349-359)")
    p.add_argument("--total-iters", type=int, default=100)
    p.add_argument("--val-freq", type=int, default=400)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--load-ckpt", default="")
    p.add_argument("--checkpoint-dir", default="meta_checkpoints")
    p.add_argument("--synthetic-cats", type=int, default=6)
    p.add_argument("--eval-map", action="store_true",
                   help="per-episode mAP/CorLoc on validation episodes "
                        "(reference infer.py:689-700)")
    p.add_argument("--per-cat-dir", default="per_cat_metrics")
    p.add_argument("--eval-ood", action="store_true",
                   help="open-set evaluation during val blocks: energy "
                        "AUROC/FPR95 of known-category (train split, eval "
                        "transforms) vs held-out-category episodes, at "
                        "detection level and over GT-region anchors "
                        "(BASELINE open-set config; reference "
                        "infer.py:689-700 eval loop)")
    p.add_argument("--ood-method", default="energy",
                   choices=["energy", "msp", "max_logit"],
                   help="per-anchor OOD score for --eval-ood")
    # real-data episodic sources
    p.add_argument("--coco-ann", default="",
                   help="COCO annotation JSON: queries come from this "
                        "dataset instead of the synthetic source")
    p.add_argument("--data-dir", default="",
                   help="image directory for --coco-ann")
    p.add_argument("--support-dir", default="",
                   help="per-category support-image directory tree "
                        "(root/<category name>/*, the reference web-image "
                        "glob, dataloader.py:274-276); defaults to query "
                        "images of the category when unset")
    p.add_argument("--num-train-cats", type=int, default=0,
                   help="categories (by image count) for training; "
                        "0 = two thirds of all")
    p.add_argument("--num-val-cats", type=int, default=0,
                   help="held-out categories for validation episodes")
    p.add_argument("--prefetch-episodes", type=int, default=2,
                   help="episodes assembled ahead on a background thread "
                        "(0 = synchronous; the reference's preloader "
                        "worker analog, preloader.py:153-278)")
    p.add_argument("--episode-mesh", type=int, default=0,
                   help="devices for the SPMD meta-batch step: phase-B "
                        "episode meta-grads computed in parallel over an "
                        "('episode',) mesh instead of accumulated "
                        "sequentially (meta_batch_size %% N must be 0)")
    p.add_argument("--fpn-repeats", type=int, default=None,
                   help="override fpn_cell_repeats (small-scale debugging)")
    p.add_argument("--head-repeats", type=int, default=None,
                   help="override box_class_repeats (small-scale debugging)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import get_efficientdet_config
    from ..data.episodic import EpisodicDataset, SyntheticEpisodeSource
    from ..evaluation import PascalEvaluator
    from ..models import EfficientDet
    from ..meta import MetaConfig, MetaTrainer, ProjectionNet
    from ..meta.projection import POS_DIM
    from ..train.checkpoint import CheckpointManager, restore_variables

    meta_cfg = MetaConfig(
        n_way=args.n_way, num_sup=args.num_sup, num_qry=args.num_qry,
        num_zero_images=args.num_zero_images,
        meta_batch_size=args.meta_batch_size, img_size=args.img_size,
        qry_img_size=args.qry_img_size, proj_iters=args.proj_iters,
        steps=args.steps, inner_lr=args.inner_lr, meta_lr=args.meta_lr,
        meta_clip=args.meta_clip, sim_thresh=args.sim_thresh,
        sim_target=args.sim_target, loss_mode=args.loss_mode,
        proj_depth=args.proj_depth, proj_size=args.proj_size,
        proj_coeff=args.proj_coeff, obj_coeff=args.obj_coeff,
        proj_reg=args.proj_reg,
        random_trans=args.random_trans, supp_aug=args.supp_aug,
        ref_pos_enc=args.ref_pos_enc,
        ref_stale_proj_activs=args.ref_stale_proj_activs,
        separate_head=args.separate_head, learn_inner=args.learn_inner,
        lr_stage_step=args.lr_stage_step, only_final=args.only_final,
        multi_inner=args.multi_inner,
        freeze_bb_bn=args.freeze_bb_bn, freeze_fpn_bn=args.freeze_fpn_bn,
        freeze_box_bn=args.freeze_box_bn,
        train_bb=args.train_bb, train_fpn=args.train_fpn)

    # the meta task is binary (task-object vs not): num_classes=1
    # (reference swaps in MetaHead with num_classes=1, infer.py:191-193)
    model_cfg = get_efficientdet_config(
        args.model, num_classes=1,
        image_size=(args.qry_img_size, args.qry_img_size),
        separate_head=args.separate_head)
    if args.fpn_repeats is not None:
        model_cfg = model_cfg.replace(fpn_cell_repeats=args.fpn_repeats)
    if args.head_repeats is not None:
        model_cfg = model_cfg.replace(box_class_repeats=args.head_repeats)
    model = EfficientDet(model_cfg)
    dummy = jnp.zeros((1, args.qry_img_size, args.qry_img_size, 3))
    variables = jax.jit(
        lambda k: model.init(k, dummy, training=False))(jax.random.key(0))
    if args.load_ckpt:
        try:
            variables = restore_variables(args.load_ckpt, variables)
        except Exception:
            if not args.separate_head:
                raise
            # pretrained checkpoint without the sep head — the reference
            # loads weights BEFORE add_head (infer.py:198-204): restore
            # everything else, keep the freshly-initialized sep head
            cn = dict(variables["params"]["class_net"])
            sep_fresh = cn.pop("predict_sep")
            tmpl = dict(variables)
            tmpl["params"] = {**variables["params"], "class_net": cn}
            restored = restore_variables(args.load_ckpt, tmpl)
            cn = dict(restored["params"]["class_net"])
            cn["predict_sep"] = sep_fresh
            variables = dict(restored)
            variables["params"] = {**restored["params"], "class_net": cn}

    proj_net = ProjectionNet(
        fpn_channels=model_cfg.fpn_channels, width=args.proj_size,
        depth=args.proj_depth)
    proj_vars = proj_net.init(
        jax.random.key(1),
        jnp.zeros((1, model_cfg.fpn_channels + POS_DIM)))
    proj_params = dict(proj_vars["params"])
    proj_params["dot_mult"] = jnp.float32(meta_cfg.dot_mult)
    proj_params["dot_add"] = jnp.float32(meta_cfg.dot_add)

    if args.coco_ann:
        # real-data episodes: COCO-format queries (+ optional directory
        # support source — the reference's per-category web-image glob)
        from ..data import CocoParser, ParserQuerySource
        from ..data.metadata import directory_support_source
        from ..data.pretrain_stream import split_categories_by_count

        parser = CocoParser(args.coco_ann)
        src = ParserQuerySource(args.data_dir, parser)
        counts = src.category_counts()
        cats = sorted(counts)
        n_train = args.num_train_cats or max(1, len(cats) * 2 // 3)
        n_val = args.num_val_cats or max(1, len(cats) - n_train)
        train_cats, val_cats = split_categories_by_count(
            counts, n_train, n_val)
        val_cats = val_cats or train_cats
        if args.support_dir:
            # labels are 1-based indices into the parser's category list
            cat_names = {c: parser.cat_names[c - 1] for c in cats} \
                if getattr(parser, "cat_names", None) else \
                {c: str(c) for c in cats}
            support = directory_support_source(args.support_dir, cat_names)
            empty = [c for c in cats if not support.get(c)]
            if empty:
                raise SystemExit(
                    f"--support-dir has no images for categories {empty}")
        else:
            # fall back to query images as supports — lazily per category
            # (eager closure-per-image is O(dataset) host work at LVIS scale)
            from ..data.episodic import QuerySupportFallback
            support = QuerySupportFallback(src, cats)
    else:
        src = SyntheticEpisodeSource(num_cats=args.synthetic_cats,
                                     img_hw=(args.img_size, args.img_size))
        cats = list(range(1, args.synthetic_cats + 1))
        train_cats = cats[:max(1, len(cats) * 2 // 3)]
        val_cats = cats[max(1, len(cats) * 2 // 3):] or train_cats
        support = src.support_source(cats)
    dataset = EpisodicDataset(
        support, src, model_cfg, meta_cfg,
        train_cats=train_cats, val_cats=val_cats, val_freq=args.val_freq,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    trainer = MetaTrainer(
        model, proj_net, variables, meta_cfg, model_cfg,
        dataset.builder.proj_level_sizes, proj_params=proj_params,
        lr_lr=args.lr_lr)

    ckpt = CheckpointManager(args.checkpoint_dir, keep=3)
    evaluator = PascalEvaluator(num_classes=1) if args.eval_map else None
    det_ood_ev = gt_ood_ev = None
    if args.eval_ood:
        from ..evaluation import OodEvaluator
        det_ood_ev, gt_ood_ev = OodEvaluator(), OodEvaluator()

    def score_ood_episode(episode, is_known: bool):
        """Accumulate one episode's open-set scores: detection-level plus
        GT-region (best-IoU anchor) energies from the adapted head."""
        dets, det_ood, gt_ood, gt_valid = trainer.episode_ood_scores(
            episode, ood_method=args.ood_method)
        dets, det_ood = np.asarray(dets), np.asarray(det_ood)
        keep = dets[..., 4] > 0.02      # low bar: include weak detections
        scores = det_ood[keep]
        det_ood_ev.add_predictions(
            scores, {"is_known": np.full(len(scores), is_known)})
        gt_scores = np.asarray(gt_ood)[np.asarray(gt_valid)]
        gt_ood_ev.add_predictions(
            gt_scores, {"is_known": np.full(len(gt_scores), is_known)})
    episode_mesh = None
    episode_buf = []
    if args.episode_mesh > 1:
        from ..parallel import create_mesh
        if meta_cfg.meta_batch_size % args.episode_mesh:
            raise SystemExit("--episode-mesh must divide --meta-batch-size")
        episode_mesh = create_mesh((args.episode_mesh,), ("episode",))

    os.makedirs(args.per_cat_dir, exist_ok=True)
    acc = defaultdict(float)
    val_acc = defaultdict(float)
    val_count = 0
    val_det_count = 0    # val episodes that produced detection metrics
    best_val = float("inf")
    best_is_proj = True   # best_val tracks proj_loss until the phase flips
    t0 = time.time()
    it = 0
    from ..data.episodic import EpisodePrefetcher
    episodes = (EpisodePrefetcher(dataset, depth=args.prefetch_episodes)
                if args.prefetch_episodes > 0 else dataset)
    for episode in episodes:
        if it >= args.total_iters:
            break
        it += 1
        phase_a = it <= meta_cfg.proj_iters
        if episode["val_iter"]:
            metrics = trainer.eval_episode(episode, phase_a)
            key = "proj_loss" if phase_a else "final_loss"
            vl = float(metrics[key])
            if best_is_proj and not phase_a:
                # phase flip: best_val tracked the proj objective, which
                # is incommensurate with the MAML query loss — reset so
                # phase-B "best" checkpoints are reachable
                best_val = float("inf")
                best_is_proj = False
            if evaluator is not None and not phase_a:
                # per-episode detection metrics on the adapted head
                # (reference infer.py:689-700): GT is binary class 1
                dets = trainer.episode_detections(episode)
                evaluator.add_predictions(
                    dets, {"bbox": episode["qry_gt_bbox"],
                           "cls": episode["qry_gt_cls"]})
                res = evaluator.evaluate()
                evaluator.reset()
                val_acc["val_mAP"] += float(res["mAP@0.5IOU"])
                val_acc["val_CorLoc"] += float(res["meanCorLoc@0.5IOU"])
                val_det_count += 1
                # per-category AP/CorLoc dumps (reference infer.py:842,861)
                np.save(os.path.join(args.per_cat_dir,
                                     f"{args.exp}_ap_{it}.npy"),
                        res["per_class_ap"])
                np.save(os.path.join(args.per_cat_dir,
                                     f"{args.exp}_corloc_{it}.npy"),
                        res["per_class_corloc"])
            if det_ood_ev is not None and not phase_a:
                # unknown arm: this held-out-category episode; known arm:
                # a fresh eval-transform episode over train categories
                score_ood_episode(episode, is_known=False)
                score_ood_episode(dataset.known_eval_episode(),
                                  is_known=True)
            # multihost: each rank runs different val episodes (per-process
            # seeded dataset) — average the loss so every rank makes the
            # SAME best-val decision (ckpt.save is an orbax cross-process
            # collective; divergent decisions deadlock the barrier)
            if jax.process_count() > 1:
                from ..parallel import process_merge
                vl = float(np.mean(process_merge(
                    np.float64(vl))))
            val_acc["val_loss"] += vl
            val_count += 1
            if vl < best_val:
                best_val = vl
                ckpt.save(it, trainer.meta_params, metrics={"val_loss": vl})
        elif episode_mesh is not None and not phase_a:
            # SPMD meta-batch: buffer meta_batch_size episodes, compute
            # their meta-grads in parallel over the mesh, one psum, one
            # optimizer step (vs the reference's sequential accumulation,
            # infer.py:796-809)
            episode_buf.append(episode)
            if len(episode_buf) >= meta_cfg.meta_batch_size:
                metrics = trainer.train_meta_batch_sharded(
                    episode_buf, episode_mesh)
                # metrics are meta-batch MEANS standing for n episodes;
                # scale so acc/log_freq stays a per-episode average
                # comparable with the sequential branch
                n_eps = len(episode_buf)
                episode_buf.clear()
                for k, v in metrics.items():
                    acc[k] += float(v) * n_eps
        else:
            metrics = trainer.train_episode(episode, phase_a)
            for k, v in metrics.items():
                if k != "meta_step":
                    acc[k] += float(v)
        if it % args.log_freq == 0:
            avg = {k: round(v / args.log_freq, 5) for k, v in acc.items()}
            if val_count:
                # detection metrics exist only for phase-B val episodes —
                # average them over their own count, not all val episodes
                avg.update({
                    k: round(v / (val_det_count
                                  if k in ("val_mAP", "val_CorLoc")
                                  else val_count), 5)
                    for k, v in val_acc.items()})
                val_acc = defaultdict(float)
                val_count = 0
                val_det_count = 0
                if det_ood_ev is not None:
                    # block-level open-set metrics over the pooled scores
                    for name, ev in (("det", det_ood_ev), ("gt", gt_ood_ev)):
                        r = ev.evaluate()
                        for m in ("auroc", "fpr95"):
                            v = r[m]
                            avg[f"ood_{m}_{name}"] = (
                                round(float(v), 4)
                                if np.isfinite(v) else None)
                        ev.reset()
            print(json.dumps({
                "iter": it, "phase": "proj" if phase_a else "maml",
                "eps_per_sec": round(args.log_freq / (time.time() - t0), 3),
                **avg}))
            acc = defaultdict(float)
            t0 = time.time()

    ckpt.save(it, trainer.meta_params)
    ckpt.wait()
    print(json.dumps({
        "final_iter": it,
        # math.inf serializes as bare `Infinity` (invalid JSON) — emit
        # null when no validation episode ever ran
        "best_val": best_val if best_val != float("inf") else None,
    }))


if __name__ == "__main__":
    main()
