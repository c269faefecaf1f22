"""Faster-RCNN box encode/decode (yxyx <-> ty,tx,th,tw), pure jnp.

Functional port of the capability in the reference FasterRcnnBoxCoder
(effdet/object_detection/box_coder.py:60-172) and decode_box_outputs
(effdet/anchors.py:51-85). Vectorized over leading dims; vmap for batches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

EPS = 1e-8


def _center_size(boxes_yxyx: jnp.ndarray):
    """yxyx -> (ycenter, xcenter, h, w), each [...]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes_yxyx, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    yc = ymin + 0.5 * h
    xc = xmin + 0.5 * w
    return (yc.squeeze(-1), xc.squeeze(-1), h.squeeze(-1), w.squeeze(-1))


def encode_boxes(
        boxes: jnp.ndarray,
        anchors: jnp.ndarray,
        scale_factors: Optional[Sequence[float]] = None,
        eps: float = EPS) -> jnp.ndarray:
    """Encode [*, 4] yxyx boxes against same-shape anchors -> [*, 4] tytxthtw."""
    ycenter_a, xcenter_a, ha, wa = _center_size(anchors)
    ycenter, xcenter, h, w = _center_size(boxes)
    ha = ha + eps
    wa = wa + eps
    h = h + eps
    w = w + eps

    ty = (ycenter - ycenter_a) / ha
    tx = (xcenter - xcenter_a) / wa
    th = jnp.log(h / ha)
    tw = jnp.log(w / wa)
    if scale_factors is not None:
        ty = ty * scale_factors[0]
        tx = tx * scale_factors[1]
        th = th * scale_factors[2]
        tw = tw * scale_factors[3]
    return jnp.stack([ty, tx, th, tw], axis=-1)


def decode_boxes(
        rel_codes: jnp.ndarray,
        anchors: jnp.ndarray,
        scale_factors: Optional[Sequence[float]] = None,
        output_xyxy: bool = False) -> jnp.ndarray:
    """Decode [*, 4] tytxthtw regressions against yxyx anchors.

    Returns yxyx boxes (or xyxy when output_xyxy, the NMS-friendly layout).
    """
    ycenter_a, xcenter_a, ha, wa = _center_size(anchors)
    ty, tx, th, tw = jnp.moveaxis(rel_codes, -1, 0)
    if scale_factors is not None:
        ty = ty / scale_factors[0]
        tx = tx / scale_factors[1]
        th = th / scale_factors[2]
        tw = tw / scale_factors[3]
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha
    ycenter = ty * ha + ycenter_a
    xcenter = tx * wa + xcenter_a
    ymin = ycenter - h / 2.0
    xmin = xcenter - w / 2.0
    ymax = ycenter + h / 2.0
    xmax = xcenter + w / 2.0
    if output_xyxy:
        return jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    return jnp.stack([ymin, xmin, ymax, xmax], axis=-1)


# Alias matching the reference public name (effdet/anchors.py:51).
decode_box_outputs = decode_boxes
