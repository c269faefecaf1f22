"""Fixed-shape on-device NMS (hard + soft), TPU-native.

Replaces the two native/sequential pieces of the reference post-process:
torchvision ``batched_nms`` (C++/CUDA, used at effdet/anchors.py:150) and the
Python soft-NMS loop (effdet/soft_nms.py:42-169, flagged "incredibly slow").

Design: greedy NMS truncated at ``max_out`` picks is exact when only the top
``max_out`` detections are kept (which is always the case here —
max_det_per_image). So both variants run a *fixed* ``max_out``-iteration
``lax.fori_loop`` of [argmax -> record -> suppress/decay] over fixed-size
score vectors: no dynamic shapes, no host sync, vmappable over the batch.
Per-class separation uses the class-offset trick (soft_nms.py:159-165).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against [N,4] xyxy boxes -> [N].

    Zero-intersection pairs get exactly 0 (soft_nms.py:12-39 semantics).
    """
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area1 + area2 - inter
    return jnp.where(inter > 0.0, inter / union, 0.0)


def class_offset_boxes(boxes: jnp.ndarray, classes: jnp.ndarray) -> jnp.ndarray:
    """Shift each class's boxes into a disjoint coordinate range so a single
    class-agnostic NMS never suppresses across classes."""
    max_coordinate = jnp.max(boxes)
    offsets = classes.astype(boxes.dtype) * (max_coordinate + 1.0)
    return boxes + offsets[:, None]


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def nms_fixed(
        boxes: jnp.ndarray,        # [N, 4] xyxy (pre-offset for batched/classful)
        scores: jnp.ndarray,       # [N] (entries <= 0 are ignored)
        iou_threshold: float,
        max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS, fixed max_out iterations.

    Returns (indices [max_out] int32 — -1 where fewer survivors,
             kept scores [max_out]).
    """
    def body(i, state):
        scores_rem, out_idx, out_scores = state
        top = jnp.argmax(scores_rem).astype(jnp.int32)
        top_score = scores_rem[top]
        alive = top_score > 0.0
        out_idx = out_idx.at[i].set(jnp.where(alive, top, -1))
        out_scores = out_scores.at[i].set(jnp.where(alive, top_score, 0.0))
        iou = _iou_one_vs_many(boxes[top], boxes)
        scores_rem = jnp.where(iou > iou_threshold, 0.0, scores_rem)
        scores_rem = scores_rem.at[top].set(0.0)
        return scores_rem, out_idx, out_scores

    init = (scores,
            jnp.full((max_out,), -1, dtype=jnp.int32),
            jnp.zeros((max_out,), dtype=scores.dtype))
    _, out_idx, out_scores = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_scores


@partial(jax.jit, static_argnames=(
    "max_out", "method_gaussian", "sigma", "iou_threshold", "score_threshold"))
def soft_nms_fixed(
        boxes: jnp.ndarray,        # [N, 4] xyxy (pre-offset)
        scores: jnp.ndarray,       # [N]
        max_out: int,
        method_gaussian: bool = True,
        sigma: float = 0.5,
        iou_threshold: float = 0.3,
        score_threshold: float = 0.001) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (gaussian or linear decay), fixed max_out iterations.

    Matches reference soft_nms (soft_nms.py:42-112) truncated to the first
    max_out picks: each iteration takes the argmax, records its (pre-decay)
    score, decays all remaining scores by the IoU penalty, and prunes
    anything that fell below score_threshold.
    """
    def body(i, state):
        scores_rem, out_idx, out_scores = state
        top = jnp.argmax(scores_rem).astype(jnp.int32)
        top_score = scores_rem[top]
        alive = top_score > 0.0
        out_idx = out_idx.at[i].set(jnp.where(alive, top, -1))
        out_scores = out_scores.at[i].set(jnp.where(alive, top_score, 0.0))

        iou = _iou_one_vs_many(boxes[top], boxes)
        if method_gaussian:
            decay = jnp.exp(-(iou * iou) / sigma)
        else:
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        scores_rem = scores_rem * decay
        scores_rem = jnp.where(scores_rem > score_threshold, scores_rem, 0.0)
        scores_rem = scores_rem.at[top].set(0.0)
        return scores_rem, out_idx, out_scores

    init = (scores,
            jnp.full((max_out,), -1, dtype=jnp.int32),
            jnp.zeros((max_out,), dtype=scores.dtype))
    _, out_idx, out_scores = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_scores


@partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def batched_nms(boxes, scores, classes, iou_threshold: float = 0.5,
                max_out: int = 100):
    """Per-class hard NMS for one image (torchvision.batched_nms equivalent)."""
    offset = class_offset_boxes(boxes, classes)
    return nms_fixed(offset, scores, iou_threshold, max_out)


@partial(jax.jit, static_argnames=(
    "method_gaussian", "max_out", "sigma", "iou_threshold", "score_threshold"))
def batched_soft_nms(boxes, scores, classes, method_gaussian: bool = True,
                     sigma: float = 0.5, iou_threshold: float = 0.5,
                     score_threshold: float = 0.001, max_out: int = 100):
    """Per-class soft NMS for one image (reference batched_soft_nms
    soft_nms.py:115-169 equivalent)."""
    offset = class_offset_boxes(boxes, classes)
    return soft_nms_fixed(
        offset, scores, max_out, method_gaussian=method_gaussian, sigma=sigma,
        iou_threshold=iou_threshold, score_threshold=score_threshold)
