"""On-device anchor labeling: IoU -> argmax match -> encode, fully vectorized.

TPU-first redesign of the reference's AnchorLabeler/TargetAssigner/
ArgMaxMatcher/Match stack (effdet/anchors.py:305-438,
object_detection/target_assigner.py:86-220, argmax_matcher.py:105-160,
matcher.py:151-179): instead of per-image Python loops over variable-length
GT lists, ground truth is padded to a fixed ``max_instances`` (invalid rows
have class <= -1) and every step is a fixed-shape jnp op, so the whole
labeler jits once and vmaps over the batch on device.

Match-code conventions (same as the reference):
  match[a] >= 0 : anchor a is matched to GT row match[a]   (positive)
  match[a] == -1: unmatched                                 (negative)
  match[a] == -2: ignored (between thresholds)

Class-target conventions after shifting (labels enter as 1-based):
  >= 0 : class index; -1 : background; -2 : ignore band (excluded from the
  class loss by detection_loss_flat's mask, the reference loss.py:285).

Note on the -2 band: the reference's own gather collapses ignored anchors
to the unmatched target (target_assigner.py:219-220 gathers both with
unmatched_cls_target=0 -> background after the -1 shift), which silently
gives ignore-band anchors background loss — harmless only because its
active labeler always sets unmatched_threshold == match_threshold (empty
band, anchors.py:321-325). Here the band emits -2 so the loss mask the
reference carries (loss.py:285, matcher.py:151-179's ignored code) is
actually honored when distinct thresholds are configured.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .anchors import Anchors
from .box_coder import encode_boxes
from .boxes import pairwise_iou_yxyx


@dataclasses.dataclass(frozen=True)
class LabelResult:
    """Flat per-anchor targets for one image (or a batch when vmapped)."""
    cls_targets: jnp.ndarray     # [A] int32
    box_targets: jnp.ndarray     # [A, 4] float32
    matches: jnp.ndarray         # [A] int32 match codes
    num_positives: jnp.ndarray   # [] float32


jax.tree_util.register_dataclass(
    LabelResult,
    data_fields=["cls_targets", "box_targets", "matches", "num_positives"],
    meta_fields=[],
)


def argmax_match(
        sim: jnp.ndarray,
        valid_rows: jnp.ndarray,
        matched_threshold: float,
        unmatched_threshold: float,
        negatives_lower_than_unmatched: bool = True,
        force_match_for_each_row: bool = True) -> jnp.ndarray:
    """Thresholded argmax matching of [M, A] similarity -> [A] match codes.

    ``valid_rows`` is the [M] bool mask of real (non-padding) GT rows; padded
    rows can never win a match. Force-match resolves ties to the lowest row
    index, the same tie-break the reference inherits from torch.max over a
    bool indicator (argmax_matcher.py:139-144).
    """
    num_gt, num_anchors = sim.shape
    neg_inf = jnp.asarray(-1.0, sim.dtype)
    sim_masked = jnp.where(valid_rows[:, None], sim, neg_inf)

    matched_vals = jnp.max(sim_masked, axis=0)
    matches = jnp.argmax(sim_masked, axis=0).astype(jnp.int32)

    below_unmatched = matched_vals < unmatched_threshold
    between = (matched_vals >= unmatched_threshold) & (matched_vals < matched_threshold)
    if negatives_lower_than_unmatched:
        matches = jnp.where(below_unmatched, -1, matches)
        matches = jnp.where(between, -2, matches)
    else:
        matches = jnp.where(below_unmatched, -2, matches)
        matches = jnp.where(between, -1, matches)

    if force_match_for_each_row:
        # Every valid GT row claims its best anchor, overriding thresholds.
        best_anchor_per_row = jnp.argmax(sim_masked, axis=1)               # [M]
        row_ids = jnp.arange(num_gt, dtype=jnp.int32)
        # candidate[m, a] = m where row m claims anchor a, else num_gt (sentinel)
        claims = (best_anchor_per_row[:, None] ==
                  jnp.arange(num_anchors, dtype=best_anchor_per_row.dtype)[None, :])
        claims = claims & valid_rows[:, None]
        cand = jnp.where(claims, row_ids[:, None], num_gt)
        force_row = jnp.min(cand, axis=0).astype(jnp.int32)                # [A]
        has_force = force_row < num_gt
        matches = jnp.where(has_force, force_row, matches)

    return matches


def _merge_task_class_overlaps(
        gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray, valid: jnp.ndarray,
        task_cls: jnp.ndarray) -> jnp.ndarray:
    """Relabel GT boxes overlapping (>0.9 IoU) any task-class box to task_cls.

    Episodic-training quirk carried from the reference
    (effdet/anchors.py:396-403): near-duplicate annotations of the task
    category under other labels are folded into the task category.
    """
    is_task = (gt_classes == task_cls) & valid
    sims = pairwise_iou_yxyx(gt_boxes, gt_boxes)             # [M, M]
    sims = jnp.where(is_task[:, None] & valid[None, :], sims, 0.0)
    overlapping = jnp.max(sims, axis=0) > 0.9
    return jnp.where(overlapping & valid, task_cls, gt_classes)


def label_anchors(
        anchor_boxes: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_classes: jnp.ndarray,
        match_threshold: float = 0.5,
        unmatched_threshold: Optional[float] = None,
        task_cls: Optional[jnp.ndarray] = None) -> LabelResult:
    """Label all anchors of one image against padded ground truth.

    Args:
      anchor_boxes: [A, 4] yxyx anchors.
      gt_boxes: [M, 4] yxyx GT, padded with arbitrary rows.
      gt_classes: [M] int32, 1-based labels; entries <= -1 mark padding /
        filtered instances (the reference filters them pre-assign,
        effdet/anchors.py:405-408 — here they are masked instead).
      task_cls: optional scalar class id enabling the episodic overlap-merge.

    Returns a LabelResult with flat [A] targets. Class targets are shifted
    down by 1 (background = -1), matching the reference convention.
    """
    gt_classes = gt_classes.astype(jnp.int32)
    if unmatched_threshold is None:
        unmatched_threshold = match_threshold

    valid = gt_classes > -1
    if task_cls is not None:
        gt_classes = _merge_task_class_overlaps(gt_boxes, gt_classes, valid, task_cls)

    sim = pairwise_iou_yxyx(gt_boxes, anchor_boxes)          # [M, A]
    matches = argmax_match(
        sim, valid, matched_threshold=match_threshold,
        unmatched_threshold=unmatched_threshold,
        negatives_lower_than_unmatched=True,
        force_match_for_each_row=True)

    positive = matches >= 0
    safe_idx = jnp.clip(matches, 0)

    # Classification targets: gather labels for positives, shift by -1
    # (background = -1); the ignore band keeps its -2 code so the loss
    # mask (losses.py detection_loss_flat / reference loss.py:285) works.
    gathered = jnp.where(positive, gt_classes[safe_idx], 0)
    cls_targets = jnp.where(matches == -2, -2, gathered - 1)

    # Regression targets: encode matched GT against each anchor; zeros
    # elsewhere (they carry no loss weight).
    matched_gt = jnp.where(positive[:, None], gt_boxes[safe_idx], 0.0)
    box_targets = encode_boxes(matched_gt, anchor_boxes)
    box_targets = jnp.where(positive[:, None], box_targets, 0.0)

    num_positives = jnp.sum(positive.astype(jnp.float32))
    return LabelResult(
        cls_targets=cls_targets.astype(jnp.int32),
        box_targets=box_targets.astype(jnp.float32),
        matches=matches,
        num_positives=num_positives)


def _targets_from_matches(anchor_boxes, gt_boxes, gt_classes, matches):
    """Per-image targets from match codes (shared by the XLA and Pallas
    match paths — identical to the tail of label_anchors)."""
    positive = matches >= 0
    safe_idx = jnp.clip(matches, 0)
    gathered = jnp.where(positive, gt_classes[safe_idx], 0)
    cls_targets = jnp.where(matches == -2, -2, gathered - 1)
    matched_gt = jnp.where(positive[:, None], gt_boxes[safe_idx], 0.0)
    box_targets = encode_boxes(matched_gt, anchor_boxes)
    box_targets = jnp.where(positive[:, None], box_targets, 0.0)
    return LabelResult(
        cls_targets=cls_targets.astype(jnp.int32),
        box_targets=box_targets.astype(jnp.float32),
        matches=matches,
        num_positives=jnp.sum(positive.astype(jnp.float32)))


@partial(jax.jit, static_argnames=("match_threshold", "unmatched_threshold",
                                   "impl"))
def batch_label_anchors(
        anchor_boxes: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_classes: jnp.ndarray,
        match_threshold: float = 0.5,
        unmatched_threshold: Optional[float] = None,
        impl: str = "auto") -> LabelResult:
    """Batched labeling: [B, M, 4] / [B, M] inputs.

    impl: 'pallas' = fused single-pass match kernel (ops/pallas_labeler.py,
    ~10x less HBM traffic), 'xla' = vmapped label_anchors, 'auto' = pallas
    on TPU. Use 'xla' under a mesh: GSPMD cannot partition the custom call.

    ``unmatched_threshold`` < match_threshold opens the ignore band
    (cls target -2, excluded from the class loss); default = equal
    thresholds, the reference labeler's configuration (anchors.py:321-325).
    """
    if unmatched_threshold is None:
        unmatched_threshold = match_threshold
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        from .pallas_labeler import pallas_batch_targets, pallas_label_match
        gt_classes = gt_classes.astype(jnp.int32)
        matches = pallas_label_match(
            anchor_boxes, gt_boxes, gt_classes,
            matched_threshold=match_threshold,
            unmatched_threshold=unmatched_threshold)
        cls_targets, box_targets = pallas_batch_targets(
            anchor_boxes, gt_boxes, gt_classes, matches)
        return LabelResult(
            cls_targets=cls_targets,
            box_targets=box_targets,
            matches=matches,
            num_positives=jnp.sum((matches >= 0).astype(jnp.float32),
                                  axis=1))
    return jax.vmap(
        lambda b, c: label_anchors(anchor_boxes, b, c,
                                   match_threshold=match_threshold,
                                   unmatched_threshold=unmatched_threshold)
    )(gt_boxes, gt_classes)


class AnchorLabeler:
    """Convenience wrapper mirroring the reference AnchorLabeler API
    (effdet/anchors.py:305-438), backed by the vectorized functions above."""

    def __init__(self, anchors: Anchors, num_classes: int, match_threshold: float = 0.5):
        self.anchors = anchors
        self.num_classes = num_classes
        self.match_threshold = match_threshold
        self._anchor_boxes = jnp.asarray(anchors.boxes)

    def label_anchors(self, gt_boxes, gt_classes, task_cls=None):
        """Single image -> (per-level cls targets, per-level box targets, num_pos)."""
        res = label_anchors(
            self._anchor_boxes, jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
            match_threshold=self.match_threshold, task_cls=task_cls)
        cls_levels = self.anchors.unpack_levels(res.cls_targets)
        box_levels = self.anchors.unpack_levels(res.box_targets)
        return cls_levels, box_levels, res.num_positives

    def batch_label_anchors(self, gt_boxes, gt_classes, task_cls=None):
        """Batch -> (per-level [B,H,W,A] cls, per-level [B,H,W,A*4] box, [B] num_pos)."""
        if task_cls is None:
            res = batch_label_anchors(
                self._anchor_boxes, jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                match_threshold=self.match_threshold)
        else:
            res = jax.vmap(
                lambda b, c: label_anchors(
                    self._anchor_boxes, b, c,
                    match_threshold=self.match_threshold, task_cls=task_cls)
            )(jnp.asarray(gt_boxes), jnp.asarray(gt_classes))
        cls_levels = _unpack_batched(self.anchors, res.cls_targets)
        box_levels = _unpack_batched(self.anchors, res.box_targets)
        return cls_levels, box_levels, res.num_positives

    def flat_label_anchors(self, gt_boxes, gt_classes):
        """Batch -> flat LabelResult (the fast path the training loop uses)."""
        return batch_label_anchors(
            self._anchor_boxes, jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
            match_threshold=self.match_threshold)


def _unpack_batched(anchors: Anchors, flat):
    """[B, A_total, ...] -> list of [B, H_l, W_l, A*k] per level."""
    out = []
    offset = 0
    fs = anchors.feat_sizes
    batch = flat.shape[0]
    for level in range(anchors.min_level, anchors.max_level + 1):
        h, w = fs[level]
        steps = h * w * anchors.anchors_per_location
        chunk = flat[:, offset:offset + steps]
        out.append(chunk.reshape(batch, h, w, -1))
        offset += steps
    return out
