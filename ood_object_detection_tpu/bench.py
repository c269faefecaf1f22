"""Task benches: prediction and training wrappers around EfficientDet.

Functional equivalents of the reference DetBenchPredict / DetBenchTrain
(effdet/bench.py:79-156): a bench binds model + anchors + post-process /
labeler + loss into a single jittable step. Unlike the reference, the
train bench labels anchors **on device** (vmapped target assigner) and the
predict bench's NMS is the fused fixed-shape kernel — the whole bench is
one XLA program.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .config.model_config import ModelConfig
from .models.efficientdet import EfficientDet
from .ops.anchors import Anchors
from .ops.losses import detection_loss_flat, levels_to_flat
from .ops.post_process import generate_detections
from .ops.target_assigner import batch_label_anchors


class DetBenchPredict:
    """Image batch -> [B, max_det, 6] detections (+ optional OOD scores).

    Rows are [xmin, ymin, xmax, ymax, score, class] with background class 0;
    padding rows have score 0 (reference contract, effdet/bench.py:79-103).
    """

    def __init__(self, model: EfficientDet, ood_method: Optional[str] = None):
        self.model = model
        self.config = model.config
        self.anchors = Anchors.from_config(model.config)
        self.ood_method = ood_method
        self._anchor_boxes = jnp.asarray(self.anchors.boxes)

    def __call__(self, variables, x, img_info: Optional[Dict[str, jnp.ndarray]] = None):
        dets, ood = self.forward_with_ood(variables, x, img_info)
        return dets if self.ood_method is None else (dets, ood)

    def forward_with_ood(self, variables, x,
                         img_info: Optional[Dict[str, jnp.ndarray]] = None):
        cfg = self.config
        cls_out, box_out = self.model.apply(variables, x, training=False)
        img_scale = img_size = None
        if img_info is not None:
            img_scale = img_info["img_scale"]
            img_size = img_info["img_size"]
        return generate_detections(
            cls_out, box_out, self._anchor_boxes, num_classes=cfg.num_classes,
            img_scale=img_scale, img_size=img_size,
            max_detection_points=cfg.max_detection_points,
            max_det_per_image=cfg.max_det_per_image,
            soft_nms=cfg.soft_nms, ood_method=self.ood_method,
            topk_method=cfg.topk_method, topk_recall=cfg.topk_recall,
            nms_impl=cfg.nms_impl, anchors=self.anchors)

    def jit(self):
        """A jitted callable (variables, x) -> detections."""
        return jax.jit(lambda v, x: self(v, x))

    def sharded(self, mesh, axis: str = "data"):
        """Data-parallel predict step over a device mesh (the v5e-8
        serving layout of BASELINE.json).

        Uses shard_map, not GSPMD sharding: each device runs the full
        fused predict — Pallas NMS kernel included — on its local batch
        shard, with zero collectives (images are independent; the
        reference's DP-inference analog is the DistributedSampler +
        per-rank eval of effdet/data/loader.py:207-214). Params are
        replicated. Returns a jitted callable (variables, x) ->
        detections [B, max_det, 6] (+ ood if configured), with B sharded
        over ``axis``.
        """
        from jax.sharding import PartitionSpec as P

        def local(variables, x):
            dets, ood = self.forward_with_ood(variables, x)
            if self.ood_method is None:
                return dets
            return dets, ood

        out_specs = P(axis) if self.ood_method is None \
            else (P(axis), P(axis))
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(), P(axis)), out_specs=out_specs,
                           check_vma=False)
        return jax.jit(fn)


class DetBenchTrain:
    """(images, padded GT) -> loss dict, with on-device anchor labeling.

    Equivalent of reference DetBenchTrain (effdet/bench.py:106-145) with
    labels computed by the vmapped target assigner instead of CPU workers.
    Also accepts pre-computed flat labels via target keys
    'label_cls' / 'label_bbox' / 'label_num_positives'.
    """

    def __init__(self, model: EfficientDet, create_labeler: bool = True):
        self.model = model
        self.config = model.config
        self.anchors = Anchors.from_config(model.config)
        self.create_labeler = create_labeler
        self._anchor_boxes = jnp.asarray(self.anchors.boxes)

    def __call__(self, variables, x, target: Dict[str, jnp.ndarray],
                 training: bool = True, eval_detections: bool = False,
                 mutable: Optional[List[str]] = None):
        cfg = self.config
        mutable = mutable if mutable is not None else (
            ["batch_stats"] if training else [])
        if mutable:
            (cls_out, box_out), new_state = self.model.apply(
                variables, x, training=training, mutable=mutable)
        else:
            cls_out, box_out = self.model.apply(variables, x,
                                                training=training)
            new_state = {}

        if not self.create_labeler and "label_num_positives" in target:
            cls_targets = target["label_cls"]
            box_targets = target["label_bbox"]
            num_positives = target["label_num_positives"]
        else:
            labels = batch_label_anchors(
                self._anchor_boxes, target["bbox"], target["cls"])
            cls_targets = labels.cls_targets
            box_targets = labels.box_targets
            num_positives = labels.num_positives

        total, cls_loss, box_loss = detection_loss_flat(
            levels_to_flat(cls_out, cfg.num_classes),
            levels_to_flat(box_out, 4),
            cls_targets, box_targets, num_positives,
            num_classes=cfg.num_classes, alpha=cfg.alpha, gamma=cfg.gamma,
            delta=cfg.delta, box_loss_weight=cfg.box_loss_weight,
            label_smoothing=cfg.label_smoothing,
            legacy_focal=cfg.legacy_focal,
            focal_modulation=cfg.focal_modulation)
        output = {"loss": total, "class_loss": cls_loss, "box_loss": box_loss}

        if eval_detections:
            dets, _ = generate_detections(
                cls_out, box_out, self._anchor_boxes,
                num_classes=cfg.num_classes,
                img_scale=target.get("img_scale"),
                img_size=target.get("img_size"),
                max_detection_points=cfg.max_detection_points,
                max_det_per_image=cfg.max_det_per_image,
                soft_nms=cfg.soft_nms,
                topk_method=cfg.topk_method, topk_recall=cfg.topk_recall,
                nms_impl=cfg.nms_impl, anchors=self.anchors)
            output["detections"] = dets
        return (output, new_state) if mutable else output


def unwrap_bench(bench):
    """Reference-parity helper (effdet/bench.py:148-156)."""
    return getattr(bench, "model", bench)
