"""Episodic meta-training step: projection pretraining + MAML meta-update.

The infer.py driver capability (reference infer.py:302-866) as two jitted
episode losses and an optax meta-optimizer with the reference's param
groups:

* Phase A (step < proj_iters): train ProjectionNet + gate on projection
  crops — confidence-masked anchor embeddings, similarity clustering,
  cosine embedding/cluster losses + objectness BCE (infer.py:356-494).
* Phase B: MAML episode — inner-adapt the class head on pseudo-labeled
  web supports, score the adapted head on the query detection loss, add
  the projection regularizers, meta-step (infer.py:557-687).

Note: in phase B the reference evaluates its projection losses on stale
phase-A activations (proj_activs is only recomputed when
train_iter < proj_iters, infer.py:349-359); here they are computed on the
episode's own projection images in both phases.

Episode batch contract (built by data.episodic):
  supp_images  [S, hs, ws, 3]   normalized float
  qry_images   [Q, hq, wq, 3]
  proj_images  [P, hs, ws, 3]
  qry_cls / qry_box / qry_num_positives : flat anchor labels (query anchors)
  proj_cls : flat anchor labels (projection anchors)
  task_cls : scalar int (the episode's category id)
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.model_config import ModelConfig
from ..models.efficientdet import EfficientDet
from ..ops.anchors import Anchors
from ..ops.losses import detection_loss_flat, levels_to_flat
from ..ops.post_process import generate_detections
from .clustering import cluster_pseudo_targets, projection_losses
from .config import MetaConfig
from .inner_loop import inner_adapt, init_inner_lrs, support_pseudo_loss
from .projection import (ProjectionNet, build_anchor_features,
                         select_confident_anchors)


def _stage_apply(model: EfficientDet, variables: Dict, x, method,
                 bn_train: bool):
    """One staged forward with the subnet's BN mode per its freeze flag
    (reference infer.py:323-337: train_mode BNs are switched to eval per
    freeze_bb_bn/freeze_fpn_bn/freeze_box_bn). ``bn_train`` normalizes
    with BATCH stats (torch train-mode BN); the running-stat writes are
    computed then discarded — the step stays pure (the reference's writes
    only affect what lands in its saved checkpoints)."""
    if not bn_train:
        return model.apply(variables, x, training=False, method=method)
    out, _ = model.apply(variables, x, training=True, method=method,
                         mutable=["batch_stats"])
    return out


def _image_features(model: EfficientDet, variables: Dict, images,
                    meta_cfg: MetaConfig):
    """image -> FPN pyramid with per-subnet BN modes (backbone:
    freeze_bb_bn, FPN: freeze_fpn_bn)."""
    feats = _stage_apply(model, variables, images,
                         EfficientDet.backbone_features,
                         not meta_cfg.freeze_bb_bn)
    return _stage_apply(model, variables, feats,
                        EfficientDet.fpn_features,
                        not meta_cfg.freeze_fpn_bn)


def projection_phase_loss(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        proj_params,
        batch: Dict[str, jnp.ndarray],
        meta_cfg: MetaConfig,
        proj_level_sizes,
        activs_override=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Phase-A loss on projection crops (infer.py:349-494).

    ``activs_override``: precomputed FPN activations used INSTEAD of the
    batch's proj crops — the ``ref_stale_proj_activs`` compat mode feeds
    the last phase-A episode's activations here (the reference's phase-B
    regularizer never recomputes them, infer.py:349-359). The current
    batch still supplies the labels (proj_cls / task_cls), exactly as
    the reference pairs stale activations with fresh labels."""
    if activs_override is not None:
        activs = activs_override  # stale tensor: no trunk grads by design
    else:
        activs = _image_features(model, variables, batch["proj_images"],
                                 meta_cfg)
        if not meta_cfg.train_fpn:
            activs = jax.lax.stop_gradient(activs)

    # level_offset: the projection anchors live on levels
    # min_level+supp_level_offset.. (EpisodeBuilder), whose grids equal
    # the head's TOP levels at the crop resolution (a 256 crop's P5/P6/P7
    # grids are 8/4/2 — exactly the offset labeler's). Without it, the
    # level zip in _select_confident_anchors silently paired P3.. with
    # the offset label slices and gathered out-of-range (clamped) labels.
    # Same alignment as the phase-B support path (inner_loop.py:95-101);
    # reference analog: the labeler/head zip truncation at infer.py:366
    # with its "Maybe only do top 3 levels?" note.
    cls_out, obj_embds = model.apply(
        variables, activs, training=False, ret_activs=True,
        level_offset=meta_cfg.supp_level_offset,
        force_batch_stats=True, method=EfficientDet.class_head)
    if meta_cfg.proj_stop_grad:
        obj_embds = jax.lax.stop_gradient(obj_embds)

    feats = build_anchor_features(
        obj_embds, level_offset=meta_cfg.supp_level_offset,
        ref_pos_enc=meta_cfg.ref_pos_enc)
    rows, confs, labels, _ = select_confident_anchors(
        feats, cls_out, meta_cfg, labels_flat=batch["proj_cls"],
        level_sizes=proj_level_sizes)

    mlp_params = {k: v for k, v in proj_params.items()
                  if k not in ("dot_mult", "dot_add")}
    embds = proj_net.apply({"params": mlp_params}, rows)
    dot_mult = proj_params["dot_mult"]
    dot_add = proj_params["dot_add"]

    result = cluster_pseudo_targets(
        embds, confs, dot_mult, dot_add,
        sim_thresh=None, refine_reduce="mean",
        sim_target=meta_cfg.sim_target)

    soft_logits = dot_mult * (confs.reshape(-1) + dot_add)
    embds_loss, clust_loss, obj_loss = projection_losses(
        result, labels.reshape(-1), batch["task_cls"], soft_logits,
        loss_mode=meta_cfg.loss_mode, sim_target=meta_cfg.sim_target,
        margin=meta_cfg.margin)

    total = meta_cfg.proj_coeff * (embds_loss + clust_loss) + \
        meta_cfg.obj_coeff * obj_loss
    metrics = {
        "embds_loss": embds_loss, "clust_loss": clust_loss,
        "obj_loss": obj_loss, "proj_loss": total,
        "valid_champions": result.valid_count,
    }
    return total, metrics


def maml_episode_loss(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        meta_params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        meta_cfg: MetaConfig,
        model_cfg: ModelConfig,
        proj_level_sizes,
        stale_proj_activs=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Phase-B episode: inner-adapt -> query detection loss -> + proj reg.

    meta_params: {'class_net': pytree, 'proj': pytree, 'inner_lrs': pytree}.
    ``variables`` supplies the frozen backbone/FPN/box subtrees and
    batch_stats. ``stale_proj_activs`` feeds the projection regularizer
    under the ``ref_stale_proj_activs`` compat mode (see
    :func:`projection_phase_loss`).
    """
    if (meta_cfg.ref_stale_proj_activs and meta_cfg.proj_reg > 0.0
            and stale_proj_activs is None):
        raise ValueError(
            "ref_stale_proj_activs=True requires stale_proj_activs (the "
            "cached phase-A activations) — MetaTrainer plumbs this "
            "automatically")
    merged = dict(variables)
    merged["params"] = {**variables["params"],
                        "class_net": meta_params["class_net"]}

    # support features: frozen feature extractor (reference no_grad,
    # infer.py:341-342); BN modes per freeze flags (infer.py:323-337)
    supp_activs = _image_features(model, merged, batch["supp_images"],
                                  meta_cfg)
    supp_activs = jax.lax.stop_gradient(supp_activs)

    # query features / box path, optionally frozen (infer.py:344-348)
    qry_feats = _stage_apply(model, merged, batch["qry_images"],
                             EfficientDet.backbone_features,
                             not meta_cfg.freeze_bb_bn)
    if not meta_cfg.train_bb:
        qry_feats = jax.lax.stop_gradient(qry_feats)
    qry_activs = _stage_apply(model, merged, qry_feats,
                              EfficientDet.fpn_features,
                              not meta_cfg.freeze_fpn_bn)
    if not meta_cfg.train_fpn:
        qry_activs = jax.lax.stop_gradient(qry_activs)
    qry_box_out = _stage_apply(model, merged, qry_activs,
                               EfficientDet.box_head,
                               not meta_cfg.freeze_box_bn)

    # inner adaptation on pseudo-labeled supports
    fast_class, inner_metrics = inner_adapt(
        model, proj_net, merged, meta_params["proj"],
        meta_params["inner_lrs"], supp_activs, meta_cfg)

    fast_vars = dict(merged)
    fast_vars["params"] = {**merged["params"], "class_net": fast_class}
    qry_class_out = model.apply(
        fast_vars, qry_activs, training=False,
        method=EfficientDet.class_head)

    qry_loss, qry_cls_loss, qry_box_loss = detection_loss_flat(
        levels_to_flat(qry_class_out, model_cfg.num_classes),
        levels_to_flat(qry_box_out, 4),
        batch["qry_cls"], batch["qry_box"], batch["qry_num_positives"],
        num_classes=model_cfg.num_classes, alpha=model_cfg.alpha,
        gamma=model_cfg.gamma, delta=model_cfg.delta,
        box_loss_weight=model_cfg.box_loss_weight,
        label_smoothing=model_cfg.label_smoothing,
        legacy_focal=model_cfg.legacy_focal,
        focal_modulation=model_cfg.focal_modulation)

    # projection regularizer on the episode's projection crops
    if meta_cfg.proj_reg > 0.0:
        proj_loss, proj_metrics = projection_phase_loss(
            model, proj_net, merged, meta_params["proj"], batch, meta_cfg,
            proj_level_sizes, activs_override=stale_proj_activs)
    else:
        proj_loss = jnp.float32(0.0)
        proj_metrics = {}

    final = qry_loss + meta_cfg.proj_reg * proj_loss
    metrics = {
        "qry_loss": qry_loss, "qry_class_loss": qry_cls_loss,
        "qry_box_loss": qry_box_loss, "final_loss": final,
        **inner_metrics, **proj_metrics,
    }
    return final, metrics


def _adapted_query_outputs(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        meta_params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        meta_cfg: MetaConfig,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Inner-adapt the class head on the episode's supports, then run the
    queries through the frozen trunk + adapted head. Returns
    (qry_class_out, qry_box_out) per-level lists — the shared stem of the
    per-episode detection and open-set metric paths."""
    merged = dict(variables)
    merged["params"] = {**variables["params"],
                        "class_net": meta_params["class_net"]}

    supp_activs = _image_features(model, merged, batch["supp_images"],
                                  meta_cfg)
    fast_class, _ = inner_adapt(
        model, proj_net, merged, meta_params["proj"],
        meta_params["inner_lrs"], supp_activs, meta_cfg)

    qry_activs = _image_features(model, merged, batch["qry_images"],
                                 meta_cfg)
    qry_box_out = _stage_apply(model, merged, qry_activs,
                               EfficientDet.box_head,
                               not meta_cfg.freeze_box_bn)
    fast_vars = dict(merged)
    fast_vars["params"] = {**merged["params"], "class_net": fast_class}
    qry_class_out = model.apply(
        fast_vars, qry_activs, training=False,
        method=EfficientDet.class_head)
    return qry_class_out, qry_box_out


def maml_episode_detections(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        meta_params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        meta_cfg: MetaConfig,
        model_cfg: ModelConfig,
        qry_anchors,
) -> jnp.ndarray:
    """Query detections from the inner-adapted head: the per-episode
    detection-metric path (reference infer.py:689-700 runs
    generate_detections on the fast-weight query outputs and feeds the
    evaluator). ``qry_anchors`` is an ops.anchors.Anchors at the query
    resolution (passed through so the selected-anchor boxes are rebuilt
    arithmetically — see the AssumeGatherIndicesInBound note in
    ops/post_process.py). Returns [Q, max_dets, 6]."""
    qry_class_out, qry_box_out = _adapted_query_outputs(
        model, proj_net, variables, meta_params, batch, meta_cfg)

    dets, _ = generate_detections(
        qry_class_out, qry_box_out, jnp.asarray(qry_anchors.boxes),
        num_classes=model_cfg.num_classes,
        max_detection_points=model_cfg.max_detection_points,
        max_det_per_image=meta_cfg.max_dets,
        iou_threshold=meta_cfg.nms_thresh,
        soft_nms=model_cfg.soft_nms,
        topk_method=model_cfg.topk_method,
        topk_recall=model_cfg.topk_recall,
        nms_impl=model_cfg.nms_impl,
        anchors=qry_anchors)
    return dets


def maml_episode_ood_scores(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        meta_params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        meta_cfg: MetaConfig,
        model_cfg: ModelConfig,
        qry_anchors: Anchors = None,
        ood_method: str = "energy",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Open-set scores from the inner-adapted head (driver ``--eval-ood``,
    the per-episode open-set arm of the reference eval loop,
    infer.py:689-700 + BASELINE open-set config).

    Returns (dets [Q,max_det,6], det_ood [Q,max_det],
             gt_ood [Q,M], gt_valid [Q,M]):
    per-detection OOD scores for every kept detection, plus the GT-region
    scores — each GT instance's best-IoU anchor's score — which never come
    up empty, so the episode ROC is always real."""
    from ..ops.boxes import pairwise_iou_yxyx
    from ..ops.post_process import _per_anchor_reduce

    if not isinstance(qry_anchors, Anchors):
        # fail BEFORE the expensive adapted forward: the parameter used to
        # take a raw [A, 4] array — an Anchors instance is required now
        # (generate_detections rebuilds selected anchors from its config)
        raise TypeError(
            "maml_episode_ood_scores requires qry_anchors=Anchors(...), "
            f"got {type(qry_anchors).__name__}")

    qry_class_out, qry_box_out = _adapted_query_outputs(
        model, proj_net, variables, meta_params, batch, meta_cfg)
    qry_anchor_boxes = jnp.asarray(qry_anchors.boxes)

    dets, det_ood = generate_detections(
        qry_class_out, qry_box_out, qry_anchor_boxes,
        num_classes=model_cfg.num_classes,
        max_detection_points=model_cfg.max_detection_points,
        max_det_per_image=meta_cfg.max_dets,
        iou_threshold=meta_cfg.nms_thresh,
        soft_nms=model_cfg.soft_nms,
        topk_method=model_cfg.topk_method,
        topk_recall=model_cfg.topk_recall,
        nms_impl=model_cfg.nms_impl,
        ood_method=ood_method,
        anchors=qry_anchors)

    _, _, ood_all = _per_anchor_reduce(
        qry_class_out, model_cfg.num_classes, ood_method=ood_method)

    def one(ood_row, boxes):
        iou = pairwise_iou_yxyx(boxes, qry_anchor_boxes)     # [M, A]
        return ood_row[jnp.argmax(iou, axis=1)]

    gt_ood = jax.vmap(one)(ood_all, batch["qry_gt_bbox"])
    gt_valid = batch["qry_gt_cls"] > 0
    return dets, det_ood, gt_ood, gt_valid


def make_meta_optimizer(
        meta_cfg: MetaConfig,
        lr_lr: Optional[float] = None) -> optax.GradientTransformation:
    """Param-group meta optimizer with the reference's staged LR enable
    (infer.py:259-274, 815-818):

    * predict pointwise params — sep head when ``separate_head``, else the
      main predict conv_pw kernel/bias — train at ``meta_lr`` from step 0.
    * the rest of the class head + the projection net train at ``meta_lr``
      from step 0 without ``separate_head``; WITH it they start at LR 0
      and switch to ``meta_lr`` after ``lr_stage_step`` meta updates.
    * the learnable inner LRs start at 0 and enable at ``lr_stage_step``
      when ``learn_inner`` (reference default); with ``learn_inner=False``
      they are frozen outright (requires_grad=False, infer.py:280-282).
      An explicit ``lr_lr`` float overrides the staging with a constant.
    """
    staged = optax.join_schedules(
        [optax.constant_schedule(0.0),
         optax.constant_schedule(meta_cfg.meta_lr)],
        [meta_cfg.lr_stage_step])

    def class_label(path, _):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        is_predict_pw = (name.startswith("predict_sep")
                         if meta_cfg.separate_head
                         else name.startswith("predict/conv_pw"))
        if is_predict_pw:
            return "predict"
        return "staged" if meta_cfg.separate_head else "main"

    def label_fn(params):
        rest = "staged" if meta_cfg.separate_head else "main"
        return {
            "class_net": jax.tree_util.tree_map_with_path(
                class_label, params["class_net"]),
            "proj": jax.tree.map(lambda _: rest, params["proj"]),
            "inner_lrs": jax.tree.map(lambda _: "lrs",
                                      params["inner_lrs"]),
        }

    def group(lr):
        if meta_cfg.optim == "adam":
            tx = optax.adam(lr)
        else:
            tx = optax.sgd(lr, momentum=0.9, nesterov=True)
        return tx

    if lr_lr is not None:
        lrs_tx = group(lr_lr)
    elif meta_cfg.learn_inner:
        lrs_tx = group(staged)
    else:
        lrs_tx = optax.set_to_zero()

    tx = optax.multi_transform(
        {"predict": group(meta_cfg.meta_lr),
         "main": group(meta_cfg.meta_lr),
         "staged": group(staged),
         "lrs": lrs_tx}, label_fn)
    if meta_cfg.meta_clip:
        tx = optax.chain(optax.clip_by_global_norm(meta_cfg.meta_clip), tx)
    return tx


class MetaTrainer:
    """Owns the jitted episode step + meta-batch accumulation
    (reference accumulates meta_batch_size episode grads before stepping,
    infer.py:796-809)."""

    def __init__(self, model: EfficientDet, proj_net: ProjectionNet,
                 variables: Dict, meta_cfg: MetaConfig,
                 model_cfg: ModelConfig, proj_level_sizes,
                 proj_params=None, lr_lr: Optional[float] = None):
        self.model = model
        self.proj_net = proj_net
        self.meta_cfg = meta_cfg
        self.model_cfg = model_cfg
        self.proj_level_sizes = tuple(proj_level_sizes)
        self.frozen_variables = variables

        if meta_cfg.separate_head != model_cfg.separate_head:
            raise ValueError(
                "MetaConfig.separate_head and ModelConfig.separate_head "
                "disagree: the second predict head's params exist only "
                "when the MODEL config enables it")
        if proj_params is None:
            raise ValueError("proj_params required (init ProjectionNet first)")
        self.meta_params = {
            "class_net": variables["params"]["class_net"],
            "proj": proj_params,
            "inner_lrs": init_inner_lrs(
                model_cfg.box_class_repeats, meta_cfg.inner_lr,
                meta_cfg.multi_inner),
        }
        self.tx = make_meta_optimizer(meta_cfg, lr_lr=lr_lr)
        self.opt_state = self.tx.init(self.meta_params)
        self._accum = None
        self._accum_count = 0
        self._build_steps()

    def _build_steps(self):
        model, proj_net = self.model, self.proj_net
        meta_cfg, model_cfg = self.meta_cfg, self.model_cfg
        lsz = self.proj_level_sizes
        # ref_stale_proj_activs compat: phase-B regularizer re-embeds the
        # LAST phase-A episode's activations (reference infer.py:349-359)
        self._stale_mode = (meta_cfg.ref_stale_proj_activs
                            and meta_cfg.proj_reg > 0.0)
        self._stale_proj_activs = None

        # the frozen backbone/FPN tree is a jit ARGUMENT, not a closure:
        # closed-over arrays become per-executable constants, so the six
        # step graphs would each embed their own HBM copy of the frozen
        # params; as an argument one device buffer is shared by all
        def episode_grads(frozen, meta_params, batch, stale=None):
            def loss_fn(mp):
                return maml_episode_loss(
                    model, proj_net, frozen, mp, batch, meta_cfg, model_cfg,
                    lsz, stale_proj_activs=stale)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(meta_params)
            return loss, metrics, grads

        def proj_grads(frozen, meta_params, batch):
            def loss_fn(mp):
                merged = dict(frozen)
                merged["params"] = {**frozen["params"],
                                    "class_net": mp["class_net"]}
                return projection_phase_loss(
                    model, proj_net, merged, mp["proj"], batch, meta_cfg, lsz)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(meta_params)
            return loss, metrics, grads

        def apply_update(meta_params, opt_state, grads):
            updates, opt_state = self.tx.update(grads, opt_state, meta_params)
            return optax.apply_updates(meta_params, updates), opt_state

        def episode_loss(frozen, meta_params, batch, stale=None):
            return maml_episode_loss(
                model, proj_net, frozen, meta_params, batch, meta_cfg,
                model_cfg, lsz, stale_proj_activs=stale)

        def proj_loss(frozen, meta_params, batch):
            merged = dict(frozen)
            merged["params"] = {**frozen["params"],
                                "class_net": meta_params["class_net"]}
            return projection_phase_loss(
                model, proj_net, merged, meta_params["proj"], batch,
                meta_cfg, lsz)

        def bind(fn):
            jitted = jax.jit(fn)
            return lambda mp, b: jitted(self.frozen_variables, mp, b)

        def bind_stale(fn):
            """Phase-B steps under the compat mode carry the cached
            stale activations as an extra jit argument (same shapes
            every episode — one executable)."""
            jitted = jax.jit(fn)

            def run(mp, b):
                if self._stale_proj_activs is None:
                    raise ValueError(
                        "ref_stale_proj_activs: no phase-A episode has "
                        "run yet — the reference reads an undefined "
                        "proj_activs in this state (infer.py:349-359); "
                        "run at least one phase-A episode (proj_iters "
                        ">= 1) before phase B")
                return jitted(self.frozen_variables, mp, b,
                              self._stale_proj_activs)
            return run

        if self._stale_mode:
            self._episode_grads = bind_stale(episode_grads)
            self._episode_loss = bind_stale(episode_loss)

            def proj_activs(frozen, batch):
                return _image_features(model, frozen,
                                       batch["proj_images"], meta_cfg)
            _proj_activs_jit = jax.jit(proj_activs)
            self._capture_proj_activs = lambda b: _proj_activs_jit(
                self.frozen_variables, b)
        else:
            self._episode_grads = bind(episode_grads)
            self._episode_loss = bind(episode_loss)
            self._capture_proj_activs = None
        self._proj_grads = bind(proj_grads)
        # loss-only eval jits: validation episodes don't pay for meta-grads
        self._proj_loss = bind(proj_loss)
        self._apply_update = jax.jit(apply_update)
        self._episode_dets = None
        self._episode_ood = None

    def train_episode(self, batch: Dict, phase_a: bool) -> Dict:
        """Accumulate one episode's grads; step when the meta-batch is full.

        Crossing the phase-A/B boundary mid-accumulation drops the
        leftover partial batch: the two phases' grads optimize different
        objectives and must not share one optimizer step."""
        if phase_a and self._stale_mode:
            # latest phase-A activations become the compat mode's stale
            # regularizer input for every later phase-B episode. This
            # pays an extra trunk pass over proj_images per phase-A
            # episode on top of the one inside _proj_grads — acceptable
            # for an opt-in fidelity mode (phase A is a small fraction
            # of a run, proj_iters out of num_iters)
            self._stale_proj_activs = self._capture_proj_activs(batch)
        fn = self._proj_grads if phase_a else self._episode_grads
        loss, metrics, grads = fn(self.meta_params, batch)
        if getattr(self, "_accum_phase", phase_a) != phase_a:
            self._accum = None
            self._accum_count = 0
        self._accum_phase = phase_a
        if self._accum is None:
            self._accum = grads
        else:
            self._accum = jax.tree.map(jnp.add, self._accum, grads)
        self._accum_count += 1
        if self._accum_count >= self.meta_cfg.meta_batch_size:
            scale = 1.0 / self._accum_count
            grads = jax.tree.map(lambda g: g * scale, self._accum)
            self.meta_params, self.opt_state = self._apply_update(
                self.meta_params, self.opt_state, grads)
            self._accum = None
            self._accum_count = 0
            metrics = dict(metrics)
            metrics["meta_step"] = True
        return metrics

    def eval_episode(self, batch: Dict, phase_a: bool) -> Dict:
        """Loss-only validation episode (no meta-gradient computation —
        the reference wastes a backward here, infer.py:687)."""
        if phase_a and self._stale_mode:
            # the reference updates proj_activs on val episodes too (the
            # phase-A else-branch is unconditional, infer.py:349-354)
            self._stale_proj_activs = self._capture_proj_activs(batch)
        fn = self._proj_loss if phase_a else self._episode_loss
        _, metrics = fn(self.meta_params, batch)
        return metrics

    def episode_detections(self, batch: Dict) -> jnp.ndarray:
        """Query detections from the inner-adapted head, for per-episode
        mAP/CorLoc (reference infer.py:689-700)."""
        if self._episode_dets is None:
            from ..ops.anchors import Anchors
            # query anchors at the QUERY resolution — model_cfg.image_size
            # may differ (EpisodeBuilder labels with the same override)
            qry_anchors = Anchors.from_config(
                self.model_cfg, img_size=self.meta_cfg.qry_img_size)
            model, proj_net = self.model, self.proj_net
            meta_cfg, model_cfg = self.meta_cfg, self.model_cfg
            jitted = jax.jit(
                lambda fz, mp, b: maml_episode_detections(
                    model, proj_net, fz, mp, b, meta_cfg, model_cfg,
                    qry_anchors))
            self._episode_dets = \
                lambda mp, b: jitted(self.frozen_variables, mp, b)
        return self._episode_dets(self.meta_params, batch)

    def episode_ood_scores(self, batch: Dict, ood_method: str = "energy"):
        """Per-detection + GT-region open-set scores from the adapted head
        (driver ``--eval-ood``). Returns (dets, det_ood, gt_ood, gt_valid).
        ``ood_method`` is baked into the jitted graph on first call."""
        if self._episode_ood is None:
            from ..ops.anchors import Anchors
            qry_anchors = Anchors.from_config(
                self.model_cfg, img_size=self.meta_cfg.qry_img_size)
            model, proj_net = self.model, self.proj_net
            meta_cfg, model_cfg = self.meta_cfg, self.model_cfg
            jitted = jax.jit(
                lambda fz, mp, b: maml_episode_ood_scores(
                    model, proj_net, fz, mp, b, meta_cfg, model_cfg,
                    qry_anchors, ood_method=ood_method))
            self._episode_ood = \
                lambda mp, b: jitted(self.frozen_variables, mp, b)
        return self._episode_ood(self.meta_params, batch)

    def train_meta_batch_sharded(self, episodes, mesh,
                                 axis: str = "episode") -> Dict:
        """One meta-update from a whole meta-batch of episodes computed
        in parallel over ``mesh`` — see :func:`make_sharded_meta_step`.
        Applies the update to ``self.meta_params`` and returns
        meta-batch-mean metrics."""
        if self._stale_mode:
            raise NotImplementedError(
                "ref_stale_proj_activs is a fidelity compat mode and is "
                "not plumbed through the sharded meta-batch step; use "
                "sequential accumulation (episode_mesh=0)")
        # key on the mesh's VALUE: id(mesh) can be recycled after GC and
        # would silently reuse a step built for a different device set
        key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
               axis)
        if getattr(self, "_sharded_step_key", None) != key:
            self._sharded_step = make_sharded_meta_step(self, mesh, axis)
            self._sharded_step_key = key
        # a partial sequential accumulation (e.g. phase-A leftovers when
        # the driver switches to sharded phase-B batches) must not leak
        # into a later sequential step
        self._accum = None
        self._accum_count = 0
        self.meta_params, self.opt_state, metrics = self._sharded_step(
            self.meta_params, self.opt_state, stack_episodes(episodes))
        return metrics

    def adapted_variables(self, supp_images: jnp.ndarray) -> Dict:
        """Inference-time open-set adaptation: inner-adapt on supports and
        return variables with the fast class head swapped in."""
        merged = dict(self.frozen_variables)
        merged["params"] = {**self.frozen_variables["params"],
                            "class_net": self.meta_params["class_net"]}
        supp_activs = _image_features(self.model, merged, supp_images,
                                      self.meta_cfg)
        fast_class, _ = inner_adapt(
            self.model, self.proj_net, merged, self.meta_params["proj"],
            self.meta_params["inner_lrs"], supp_activs, self.meta_cfg)
        out = dict(merged)
        out["params"] = {**merged["params"], "class_net": fast_class}
        return out


# Keys of an episode batch that are per-episode arrays (stackable to a
# leading meta-batch dim). 'task_cats'/'val_iter' are host-side metadata.
_EPISODE_ARRAY_KEYS = (
    "supp_images", "supp_cls_lab", "qry_images", "qry_cls", "qry_box",
    "qry_num_positives", "qry_gt_bbox", "qry_gt_cls", "proj_images",
    "proj_cls", "task_cls")


def stack_episodes(episodes) -> Dict[str, jnp.ndarray]:
    """Stack a list of episode batches to one pytree with a leading
    meta-batch dimension, ready for :func:`make_sharded_meta_step`."""
    return {k: jnp.stack([e[k] for e in episodes])
            for k in _EPISODE_ARRAY_KEYS}


def make_sharded_meta_step(trainer: "MetaTrainer", mesh,
                           axis: str = "episode"):
    """SPMD meta-batch step: episode meta-gradients computed in PARALLEL
    over a mesh axis, summed with one psum, optimizer applied replicated.

    The reference accumulates its meta_batch_size episode grads
    SEQUENTIALLY on one GPU (infer.py:796-809) — wall-clock scales with
    the meta batch. Episodes are embarrassingly parallel until the single
    grad-mean, so the TPU-native layout shards the stacked episode batch
    over the mesh (one collective per meta-update, riding ICI). Updated
    params match MetaTrainer.train_episode's sequential accumulation to
    f32 summation order (tests/test_meta.py).

    Returns a jitted ``step(meta_params, opt_state, stacked_batches) ->
    (new_meta_params, new_opt_state, mean_metrics)``. The leading episode
    dim must be divisible by the mesh axis size; each device loops its
    local chunk (static unroll), so meta_batch_size > mesh size works.
    """
    from jax.sharding import PartitionSpec as P

    model, proj_net = trainer.model, trainer.proj_net
    meta_cfg, model_cfg = trainer.meta_cfg, trainer.model_cfg
    lsz = trainer.proj_level_sizes
    tx = trainer.tx
    n = mesh.shape[axis]

    def local(frozen, meta_params, opt_state, batches):
        e_local = jax.tree.leaves(batches)[0].shape[0]

        def grads_of(b):
            def loss_fn(mp):
                return maml_episode_loss(model, proj_net, frozen, mp, b,
                                         meta_cfg, model_cfg, lsz)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(meta_params)
            return metrics, grads

        metrics, grads = grads_of(jax.tree.map(lambda x: x[0], batches))
        for i in range(1, e_local):
            m2, g2 = grads_of(jax.tree.map(lambda x: x[i], batches))
            grads = jax.tree.map(jnp.add, grads, g2)
            metrics = jax.tree.map(jnp.add, metrics, m2)
        # exact sequential-accumulation semantics: sum all E, then / E
        e_total = float(e_local * n)
        grads = jax.tree.map(lambda g: g / e_total,
                             jax.lax.psum(grads, axis))
        metrics = jax.tree.map(lambda m: m / e_total,
                               jax.lax.psum(metrics, axis))
        updates, new_opt = tx.update(grads, opt_state, meta_params)
        return optax.apply_updates(meta_params, updates), new_opt, metrics

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P(), P(axis)),
                       out_specs=(P(), P(), P()),
                       check_vma=False)
    jitted = jax.jit(fn)
    # frozen tree as an argument (shared device buffer), not a closure
    # constant baked into the executable
    return lambda mp, opt, batches: jitted(
        trainer.frozen_variables, mp, opt, batches)
