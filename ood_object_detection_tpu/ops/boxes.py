"""Box geometry primitives (pairwise IoU, clipping) as pure jnp functions.

Replaces the reference's object-oriented BoxList/IouSimilarity machinery
(effdet/object_detection/box_list.py, region_similarity_calculator.py:59-88)
with vectorized array functions that trace cleanly under jit/vmap.

Box layout conventions:
  * ``yxyx``: [ymin, xmin, ymax, xmax] — the internal format (anchors, GT).
  * ``xyxy``: [xmin, ymin, xmax, ymax] — the detection-output format.
"""
from __future__ import annotations

import jax.numpy as jnp


def area_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [*, 4] yxyx boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou_yxyx(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between [N,4] and [M,4] yxyx boxes -> [N,M].

    Matches the reference semantics (region_similarity_calculator.py:59-88):
    pairs with zero intersection get IoU exactly 0 (no 0/0 NaN).
    """
    ymin1, xmin1, ymax1, xmax1 = jnp.split(boxes1, 4, axis=-1)   # [N,1]
    ymin2, xmin2, ymax2, xmax2 = jnp.split(boxes2, 4, axis=-1)   # [M,1]

    inter_h = jnp.clip(jnp.minimum(ymax1, ymax2.T) - jnp.maximum(ymin1, ymin2.T), 0.0)
    inter_w = jnp.clip(jnp.minimum(xmax1, xmax2.T) - jnp.maximum(xmin1, xmin2.T), 0.0)
    inter = inter_h * inter_w                                    # [N,M]

    area1 = area_yxyx(boxes1)[:, None]
    area2 = area_yxyx(boxes2)[None, :]
    union = area1 + area2 - inter
    return jnp.where(inter == 0.0, 0.0, inter / union)


def pairwise_iou_xyxy(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between xyxy boxes (same math, axes swapped)."""
    # yxyx IoU is coordinate-order agnostic as long as both inputs agree on
    # (min0, min1, max0, max1) layout; xyxy satisfies that with 0<->1 swapped.
    return pairwise_iou_yxyx(
        boxes1[..., [1, 0, 3, 2]], boxes2[..., [1, 0, 3, 2]])


def clip_boxes_xyxy(boxes: jnp.ndarray, size_hw: jnp.ndarray) -> jnp.ndarray:
    """Clip [N,4] xyxy boxes to [0, size] where size_hw = (height, width).

    Mirrors reference clip_boxes_xyxy (effdet/anchors.py:88-92), which clamps
    to min 0 and then elementwise-min against [w, h, w, h].
    """
    boxes = jnp.clip(boxes, 0.0)
    wh = jnp.stack([size_hw[..., 1], size_hw[..., 0]], axis=-1)
    limit = jnp.concatenate([wh, wh], axis=-1)
    return jnp.minimum(boxes, limit)


def clip_boxes_yxyx(boxes: jnp.ndarray, size_hw: jnp.ndarray) -> jnp.ndarray:
    boxes = jnp.clip(boxes, 0.0)
    limit = jnp.concatenate([size_hw, size_hw], axis=-1)
    return jnp.minimum(boxes, limit)


def yxyx_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    return boxes[..., [1, 0, 3, 2]]


def xyxy_to_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    return boxes[..., [1, 0, 3, 2]]
