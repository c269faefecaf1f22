"""MAML-style inner loop: adapt the class head on pseudo-labeled supports.

TPU-native redesign of the reference's hand-rolled fast-weights machinery
(infer.py:557-687, MetaHead effdet/efficientdet.py:569-694): because Flax
params are a pytree, "fast weights" are just an updated class_net param
subtree — the same HeadNet serves both paths, `jax.grad` over the episode
gives second-order meta-gradients for free (the reference needs
autograd.grad(create_graph=True), infer.py:658), and learned per-layer
inner LRs are a small param pytree.

Per-layer LR mapping (reference infer.py:660-678):
  conv_rep_i params  -> lrs['conv'][i]
  predict conv_dw    -> lrs['predict_dw']
  predict conv_pw/b  -> lrs['predict_pw']
  predict_sep        -> lrs['predict_pw']  (reference 'predict_p' in n ->
                        learnable_lr[-1], infer.py:668)
  BN params          -> not adapted

Freeze rules (reference infer.py:663): ``only_final`` adapts only the
predict POINTWISE params ('predict_p' in n — the depthwise stays frozen);
``separate_head`` freezes the MAIN predict pointwise ('predict_p' in n and
'sep' not in n) while conv reps, predict depthwise and the sep head adapt.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze, unfreeze

from ..models.efficientdet import EfficientDet
from .clustering import cluster_pseudo_targets
from .config import MetaConfig
from .projection import (ProjectionNet, build_anchor_features,
                         select_confident_anchors)


def init_inner_lrs(box_class_repeats: int, inner_lr: float,
                   multi_inner: bool = True) -> Dict[str, jnp.ndarray]:
    """Learnable per-layer inner LRs (reference infer.py:243-257)."""
    if not multi_inner:
        return {"shared": jnp.asarray(inner_lr, jnp.float32)}
    return {
        "conv": jnp.full((box_class_repeats,), inner_lr, jnp.float32),
        "predict_dw": jnp.asarray(inner_lr, jnp.float32),
        "predict_pw": jnp.asarray(inner_lr, jnp.float32),
    }


def _lr_for_path(path: Tuple[str, ...], lrs: Dict[str, jnp.ndarray],
                 only_final: bool, separate_head: bool = False):
    """LR for one class_net param leaf; None = do not adapt.

    Freeze semantics mirror the reference's name tests (infer.py:663):
    'predict pointwise' means the pw kernel/bias of the predict conv (or
    the sep head); the predict DEPTHWISE is 'predict_dw', which only_final
    freezes and separate_head keeps adapting.
    """
    name = "/".join(str(p) for p in path)
    if "bn_rep" in name:
        return None
    # pointwise-predict leaves ('predict_p' in n, reference naming).
    # Non-separable heads (separable_conv=False zoo entries: resdet50,
    # efficientdetv2_*) have a single 'predict/conv' — the whole predict
    # conv IS the final layer, so it takes the pointwise role.
    is_main_pw = name.startswith("predict/conv_pw") or \
        name.startswith("predict/conv/")
    is_sep_pw = name.startswith("predict_sep")
    if separate_head and is_main_pw:
        return None                      # main head frozen, sep adapts
    if only_final and not (is_main_pw or is_sep_pw):
        return None
    if "shared" in lrs:
        return lrs["shared"]
    if is_main_pw or is_sep_pw:
        return lrs["predict_pw"]
    if name.startswith("predict/"):      # predict/conv_dw
        return lrs["predict_dw"]
    if name.startswith("conv_rep_"):
        idx = int(name.split("/")[0].split("_")[-1])
        return lrs["conv"][idx]
    return None


def sgd_fast_update(class_params, grads, lrs: Dict[str, jnp.ndarray],
                    only_final: bool = False, separate_head: bool = False):
    """fast_w = w - lr_layer * grad, skipping BN (infer.py:660-678)."""
    flat_p = jax.tree_util.tree_flatten_with_path(class_params)
    flat_g = jax.tree_util.tree_leaves(grads)
    out = []
    adapted = 0
    for (path, p), g in zip(flat_p[0], flat_g):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        lr = _lr_for_path(keys, lrs, only_final, separate_head)
        adapted += lr is not None
        out.append(p if lr is None else p - lr * g)
    if adapted == 0:
        # trace-time (Python) check: a freeze-rule/naming mismatch must be
        # a loud error, not an inner loop that silently adapts nothing
        raise ValueError(
            "inner loop adapts no class_net leaves — freeze rules "
            f"(only_final={only_final}, separate_head={separate_head}) "
            "matched no param paths")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(class_params), out)


def support_pseudo_loss(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        class_params,
        proj_params,
        supp_activs: List[jnp.ndarray],
        meta_cfg: MetaConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One inner iteration's support loss: class head forward (with the
    given fast class params), confidence top-k, projection embedding,
    clustering, BCE(cls_logits, pseudo_target) (infer.py:559-656).

    With ``meta_cfg.separate_head`` the confidence gating/clustering runs
    on the MAIN head's logits while the BCE classification loss is taken
    on the SEP head's logits — the reference's anch_confs vs class_out
    split (infer.py:560-564, 595-596, 656).
    """
    merged = dict(variables)
    merged["params"] = {**variables["params"], "class_net": class_params}

    sep_out = None
    if meta_cfg.separate_head:
        sep_out, cls_out, activs = model.apply(
            merged, supp_activs, training=False, ret_activs=True,
            level_offset=meta_cfg.supp_level_offset,
            force_batch_stats=True, heads="both",
            method=EfficientDet.class_head)
    else:
        cls_out, activs = model.apply(
            merged, supp_activs, training=False, ret_activs=True,
            level_offset=meta_cfg.supp_level_offset,
            force_batch_stats=True, method=EfficientDet.class_head)

    feats = build_anchor_features(
        activs, level_offset=meta_cfg.supp_level_offset,
        ref_pos_enc=meta_cfg.ref_pos_enc)
    rows, confs, _, sep_sel = select_confident_anchors(
        feats, cls_out, meta_cfg, sep_out=sep_out)
    # rows [S, K, C+42], confs [S, K]

    if meta_cfg.proj_stop_grad:
        rows = jax.lax.stop_gradient(rows)
    embds = proj_net.apply({"params": {k: v for k, v in proj_params.items()
                                       if k not in ("dot_mult", "dot_add")}},
                           rows)
    dot_mult = proj_params["dot_mult"]
    dot_add = proj_params["dot_add"]

    result = cluster_pseudo_targets(
        embds, confs, dot_mult, dot_add,
        sim_thresh=meta_cfg.sim_thresh, refine_reduce="sum",
        sim_target=meta_cfg.sim_target,
        gate_stop_grad=not meta_cfg.inner_thresh_train)

    cls_flat = (sep_sel if meta_cfg.separate_head else confs).reshape(-1)
    target = jax.lax.stop_gradient(result.target) \
        if not meta_cfg.inner_thresh_train else result.target
    bce = jnp.clip(cls_flat, 0) - cls_flat * target + \
        jnp.log1p(jnp.exp(-jnp.abs(cls_flat)))
    loss = jnp.mean(bce)
    metrics = {
        "supp_class_loss": loss,
        "target_sum": jnp.sum(result.target),
        # distinct key: maml_episode_loss merges these with the projection
        # regularizer's metrics, which carry their own 'valid_champions'
        "supp_valid_champions": result.valid_count,
    }
    return loss, metrics


def inner_adapt(
        model: EfficientDet,
        proj_net: ProjectionNet,
        variables: Dict,
        proj_params,
        inner_lrs: Dict[str, jnp.ndarray],
        supp_activs: List[jnp.ndarray],
        meta_cfg: MetaConfig,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Run ``meta_cfg.steps`` inner SGD steps on the class head.

    Returns (fast class_net params, last-step metrics). Differentiable
    end-to-end: meta-grads flow through the inner update (second order).
    """
    class_params = variables["params"]["class_net"]
    metrics = {}
    for _ in range(meta_cfg.steps):
        (loss, metrics), grads = jax.value_and_grad(
            lambda cp: support_pseudo_loss(
                model, proj_net, variables, cp, proj_params, supp_activs,
                meta_cfg),
            has_aux=True)(class_params)
        class_params = sgd_fast_update(
            class_params, grads, inner_lrs, only_final=meta_cfg.only_final,
            separate_head=meta_cfg.separate_head)
    return class_params, metrics
