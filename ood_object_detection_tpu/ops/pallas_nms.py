"""Pallas TPU kernel: batched fixed-iteration (soft-)NMS entirely in VMEM.

The XLA lowering of the greedy NMS loop (ops/nms.py) round-trips HBM and
pays per-iteration scheduling latency (~68us/iter for D0 shapes on v5e).
This kernel keeps the full working set in VMEM — boxes as four [B, N]
coordinate planes (VPU-native 2D layout), scores [B, N] — and runs the
max_out iterations of [row-argmax -> one-hot select -> IoU -> suppress]
as one fused program. The selected box is extracted with a masked
reduction instead of a gather (gathers are the one op Mosaic handles
poorly here).

Semantics are identical to nms_fixed / soft_nms_fixed: greedy NMS
truncated at max_out picks, which is exact for a max_out-detection budget.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                idx_out_ref, score_out_ref,
                *, max_out: int, iou_threshold: float,
                soft: bool, sigma: float, score_threshold: float):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    area = (x2 - x1) * (y2 - y1)                      # [B, N]
    n = x1.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)

    def body(m, scores):
        top_score = jnp.max(scores, axis=1, keepdims=True)        # [B, 1]
        top_idx = jnp.argmax(scores, axis=1, keepdims=True)       # [B, 1]
        onehot = col_ids == top_idx                               # [B, N]
        alive = top_score > 0.0

        # masked-reduction "gather" of the selected box per row
        sel = lambda plane: jnp.sum(
            jnp.where(onehot, plane, 0.0), axis=1, keepdims=True)  # [B, 1]
        bx1, by1, bx2, by2 = sel(x1), sel(y1), sel(x2), sel(y2)
        barea = (bx2 - bx1) * (by2 - by1)

        iw = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = iw * ih
        union = barea + area - inter
        iou = jnp.where(inter > 0.0, inter / union, 0.0)          # [B, N]

        # outputs are [1, max_out, chunk]: dynamic indexing on the sublane
        # dim is Mosaic-friendly (dynamic lane-dim stores are not)
        idx_out_ref[0, pl.ds(m, 1), :] = jnp.where(
            alive, top_idx, -1).astype(jnp.int32).reshape(1, -1)
        score_out_ref[0, pl.ds(m, 1), :] = jnp.where(
            alive, top_score, 0.0).reshape(1, -1)

        if soft:
            decay = jnp.exp(-(iou * iou) / sigma)
            scores = scores * decay
            scores = jnp.where(scores > score_threshold, scores, 0.0)
        else:
            scores = jnp.where(iou > iou_threshold, 0.0, scores)
        scores = jnp.where(onehot, 0.0, scores)
        return scores

    jax.lax.fori_loop(0, max_out, body, scores_ref[:])


@functools.partial(jax.jit, static_argnames=(
    "max_out", "iou_threshold", "soft", "sigma", "score_threshold"))
def pallas_batched_nms(
        boxes: jnp.ndarray,        # [B, N, 4] xyxy (pre-offset per class)
        scores: jnp.ndarray,       # [B, N] (<= 0 entries ignored)
        max_out: int = 100,
        iou_threshold: float = 0.5,
        soft: bool = False,
        sigma: float = 0.5,
        score_threshold: float = 0.001) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused batched NMS. Returns (keep_idx [B, max_out] int32 with -1
    padding, kept scores [B, max_out])."""
    b, n, _ = boxes.shape
    x1 = boxes[:, :, 0]
    y1 = boxes[:, :, 1]
    x2 = boxes[:, :, 2]
    y2 = boxes[:, :, 3]

    kernel = functools.partial(
        _nms_kernel, max_out=max_out, iou_threshold=iou_threshold,
        soft=soft, sigma=sigma, score_threshold=score_threshold)

    # chunk the batch so the working set (5 f32 planes + outputs) stays
    # within VMEM (~16 MB): ~5*4*chunk*n bytes
    chunk = b
    while chunk > 1 and 5 * 4 * chunk * n > 10 * 1024 * 1024:
        chunk //= 2
    while b % chunk:
        chunk -= 1
    g = b // chunk

    plane = pl.BlockSpec((chunk, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, max_out, chunk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    idx_out, score_out = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((g, max_out, chunk), jnp.int32),
            jax.ShapeDtypeStruct((g, max_out, chunk), jnp.float32),
        ),
        in_specs=[plane] * 5,
        out_specs=(out_spec, out_spec),
        # interpreter mode off-TPU so the kernel is testable anywhere
        interpret=jax.default_backend() != "tpu",
    )(x1.astype(jnp.float32), y1.astype(jnp.float32),
      x2.astype(jnp.float32), y2.astype(jnp.float32),
      scores.astype(jnp.float32))
    # [g, max_out, chunk] -> [g, chunk, max_out] -> [b, max_out]
    idx_out = jnp.moveaxis(idx_out, 1, 2).reshape(b, max_out)
    score_out = jnp.moveaxis(score_out, 1, 2).reshape(b, max_out)
    return idx_out, score_out
