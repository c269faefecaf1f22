"""Train state + SPMD train/eval steps.

The pretrain.py capability (reference pretrain.py:68-406) as a single jitted
SPMD step: forward (bf16-friendly), on-device anchor labeling, focal+huber
loss, grad clip (10.0, reference pretrain.py:272), optimizer update, EMA
(decay 0.9998, train_config.py:31), BN running-stat update. Under a
``jax.sharding.Mesh`` the batch is sharded over the 'data' axis and XLA
inserts the gradient all-reduces over ICI.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config.model_config import ModelConfig
from ..config.train_config import TrainConfig
from ..models.efficientdet import EfficientDet
from ..ops.anchors import Anchors
from ..ops.losses import detection_loss_nhwc
from ..ops.target_assigner import batch_label_anchors


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    def variables(self, use_ema: bool = False):
        params = self.ema_params if (use_ema and self.ema_params is not None) \
            else self.params
        return {"params": params, "batch_stats": self.batch_stats}


def make_optimizer(train_config: TrainConfig,
                   lr_schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    lr = lr_schedule if lr_schedule is not None else train_config.lr
    tx = _base_tx(train_config, lr)
    chain = []
    if train_config.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(train_config.clip_grad_norm))
    chain.append(tx)
    return optax.chain(*chain)


def _base_tx(train_config: TrainConfig, lr) -> optax.GradientTransformation:
    opt_name = train_config.opt
    if opt_name == "momentum":
        return optax.sgd(lr, momentum=train_config.momentum, nesterov=False)
    if opt_name == "adam":
        return optax.adam(lr, eps=train_config.eps)
    if opt_name == "adamw":
        return optax.adamw(lr, eps=train_config.eps,
                           weight_decay=train_config.weight_decay)
    raise ValueError(f"unknown optimizer {opt_name}")


def param_group_labels(params) -> Any:
    """Label each param leaf 'backbone' / 'fpn' / 'heads' by its top-level
    module (the reference's optimizer param groups, pretrain.py:179-187)."""
    def top_label(k: str) -> str:
        if k == "backbone":
            return "backbone"
        if k == "fpn":
            return "fpn"
        return "heads"
    return {k: jax.tree.map(lambda _: top_label(k), v)
            for k, v in params.items()}


def make_grouped_optimizer(
        train_config: TrainConfig,
        group_schedules: Dict[str, Any],
) -> optax.GradientTransformation:
    """Per-module-group optimizer (reference per-group LRs + the
    iter-200 LR re-warm, pretrain.py:179-187,279-281 — expressed as
    per-group schedules). group_schedules maps
    {'backbone','fpn','heads'} -> lr schedule (or float)."""
    txs = {g: _base_tx(train_config, lr)
           for g, lr in group_schedules.items()}
    chain = []
    if train_config.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(train_config.clip_grad_norm))
    chain.append(optax.multi_transform(txs, param_labels=param_group_labels))
    return optax.chain(*chain)


def cosine_lr_schedule(train_config: TrainConfig,
                       steps_per_epoch: int) -> Callable:
    warmup = optax.linear_schedule(
        train_config.warmup_lr, train_config.lr,
        train_config.warmup_epochs * steps_per_epoch)
    cosine = optax.cosine_decay_schedule(
        train_config.lr,
        max(1, (train_config.epochs - train_config.warmup_epochs) * steps_per_epoch),
        alpha=train_config.min_lr / train_config.lr)
    return optax.join_schedules(
        [warmup, cosine], [train_config.warmup_epochs * steps_per_epoch])


def create_train_state(
        model: EfficientDet,
        train_config: TrainConfig,
        rng: jax.Array,
        lr_schedule: Optional[Callable] = None,
        init_batch_size: int = 1,
        tx: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    cfg = model.config
    h, w = cfg.image_size
    dummy = jnp.zeros((init_batch_size, h, w, 3), jnp.float32)
    variables = model.init(rng, dummy, training=False)
    if tx is None:
        tx = make_optimizer(train_config, lr_schedule)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"])
        if train_config.use_ema else None,
    )
    return state, tx


def detection_train_step(
        model: EfficientDet,
        tx: optax.GradientTransformation,
        anchor_boxes: jnp.ndarray,
        train_config: TrainConfig,
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        freeze_bn: str = "none",
        label_impl: str = "auto",
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SPMD training step. batch: {'image' [B,H,W,3] float,
    'bbox' [B,M,4] yxyx, 'cls' [B,M] int (pad = -1)}.

    freeze_bn: 'none' | 'backbone' | 'all' — BN layers in the frozen scope
    use running stats and don't update them (the reference's set_bn_eval
    on model / model.backbone, pretrain.py:169-176; the model's `training`
    flag gates only BN, so this is exact)."""
    cfg = model.config
    assert freeze_bn in ("none", "backbone", "all")
    bb_training = freeze_bn == "none"
    rest_training = freeze_bn != "all"

    labels = batch_label_anchors(anchor_boxes, batch["bbox"], batch["cls"],
                                 impl=label_impl)

    def forward(m, x):
        feats = m.backbone(x, bb_training)
        activs = m.fpn(feats, rest_training)
        return m.heads(activs, rest_training)

    # stochastic depth (reference `dropout` flag -> backbone drop_path):
    # active only when configured; the rng folds the step counter so every
    # step drops a different block subset, deterministically under resume
    rngs = None
    if float((cfg.backbone_args or {}).get("drop_path_rate", 0.0)) > 0.0:
        rngs = {"drop_path": jax.random.fold_in(
            jax.random.key(0x0D10), state.step)}

    def loss_fn(params):
        (cls_out, box_out), new_model_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], method=forward, mutable=["batch_stats"],
            rngs=rngs)
        # per-level NHWC loss: no [B, A_total, C] relayout in fwd or bwd
        total, cls_loss, box_loss = detection_loss_nhwc(
            cls_out, box_out,
            labels.cls_targets, labels.box_targets, labels.num_positives,
            num_classes=cfg.num_classes, alpha=cfg.alpha, gamma=cfg.gamma,
            delta=cfg.delta, box_loss_weight=cfg.box_loss_weight,
            label_smoothing=cfg.label_smoothing,
            legacy_focal=cfg.legacy_focal,
            focal_modulation=cfg.focal_modulation,
            remat_cls=train_config.remat_cls_loss)
        return total, (cls_loss, box_loss, new_model_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (cls_loss, box_loss, new_model_state)), grads = grad_fn(state.params)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_ema = state.ema_params
    if new_ema is not None:
        # warmup-corrected decay (the timm/TF trick): early steps track the
        # raw weights closely instead of the init
        step_f = state.step.astype(jnp.float32) + 1.0
        d = jnp.minimum(train_config.ema_decay,
                        (1.0 + step_f) / (10.0 + step_f))
        new_ema = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), new_ema, new_params)

    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_model_state.get("batch_stats", state.batch_stats),
        opt_state=new_opt_state,
        ema_params=new_ema)

    metrics = {
        "loss": loss,
        "class_loss": cls_loss,
        "box_loss": box_loss,
        "num_positives": jnp.sum(labels.num_positives),
        "grad_norm": optax.global_norm(grads),
    }
    return new_state, metrics


def make_train_step(model: EfficientDet, tx, anchors: Anchors,
                    train_config: TrainConfig, mesh=None, donate: bool = True,
                    spatial_axis: Optional[str] = None,
                    freeze_bn: str = "none"):
    """Build the jitted (optionally mesh-sharded) train step.

    With ``spatial_axis`` set (2D mesh, e.g. axes ('data', 'spatial')),
    images are additionally sharded along H — XLA GSPMD inserts the conv
    halo exchanges — for resolutions whose activations exceed one chip's
    HBM (the D7x@1536 case, SURVEY §5.7).
    """
    anchor_boxes = jnp.asarray(anchors.boxes)
    # pallas labeler only off-mesh: GSPMD cannot partition the custom call
    step_fn = partial(detection_train_step, model, tx, anchor_boxes,
                      train_config, freeze_bn=freeze_bn,
                      label_impl="auto" if mesh is None else "xla")
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if spatial_axis is not None:
        batch_shardings = {
            "image": NamedSharding(mesh, P("data", spatial_axis)),
            "bbox": data,
            "cls": data,
        }
    else:
        batch_shardings = data
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())


def detection_eval_step(model: EfficientDet, anchor_boxes, state: TrainState,
                        batch, use_ema: bool = True,
                        label_impl: str = "auto"):
    """Loss-only eval step (validation loss drives best-ckpt selection,
    reference pretrain.py:296-298)."""
    cfg = model.config
    labels = batch_label_anchors(anchor_boxes, batch["bbox"], batch["cls"],
                                 impl=label_impl)
    cls_out, box_out = model.apply(
        state.variables(use_ema), batch["image"], training=False)
    total, cls_loss, box_loss = detection_loss_nhwc(
        cls_out, box_out,
        labels.cls_targets, labels.box_targets, labels.num_positives,
        num_classes=cfg.num_classes, alpha=cfg.alpha, gamma=cfg.gamma,
        delta=cfg.delta, box_loss_weight=cfg.box_loss_weight,
        label_smoothing=cfg.label_smoothing, legacy_focal=cfg.legacy_focal,
        focal_modulation=cfg.focal_modulation)
    return {"loss": total, "class_loss": cls_loss, "box_loss": box_loss}
