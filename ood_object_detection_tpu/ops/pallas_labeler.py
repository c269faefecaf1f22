"""Pallas TPU kernels: fused anchor labeling (IoU -> match -> targets).

Two hot spots in the XLA lowering of label_anchors
(ops/target_assigner.py) motivate these kernels:

  1. the match step materializes several [M, A] buffers per image (IoU,
     maskings, the force-match claims matrix);
  2. the target step gathers [A]-sized class/box rows from the M ground
     truths — TPU gathers from the lane dimension serialize (~28 ms/step
     at B=64, vs <1 ms of actual data movement).

The match kernel computes the IoU tile in VMEM and reduces it immediately
(one anchor pass per image); the target kernel replaces the gathers with
an in-VMEM one-hot reduction over the M rows. Combined, labeling drops
from ~40 ms to ~2 ms per B=64 training step.

Semantics are identical to ops/target_assigner (reference ArgMaxMatcher,
argmax_matcher.py:105-160). Tie-breaks are made explicit rather than
trusting hardware argmax order: per-anchor match picks the LOWEST row
with the max IoU and the per-row best anchor is the LOWEST anchor index
with the row max (jnp.argmax first-wins), force-match resolves contested
anchors to the lowest row.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .box_coder import EPS

# anchors per block: [M, T] f32 tiles (M=100 -> ~3 MB at T=4096)
_BLOCK_T = 4096


def _match_kernel(gy1_ref, gx1_ref, gy2_ref, gx2_ref, valid_ref,
                  ay1_ref, ax1_ref, ay2_ref, ax2_ref,
                  vals_ref, match_ref, rowmax_ref, rowarg_ref,
                  *, num_anchors: int, block_t: int):
    g = pl.program_id(1)

    gy1 = gy1_ref[0]                                             # [M, 1]
    gx1 = gx1_ref[0]
    gy2 = gy2_ref[0]
    gx2 = gx2_ref[0]
    valid = valid_ref[0] > 0.0

    ay1 = ay1_ref[:]                                             # [1, T]
    ax1 = ax1_ref[:]
    ay2 = ay2_ref[:]
    ax2 = ax2_ref[:]

    inter_h = jnp.maximum(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
    inter_w = jnp.maximum(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
    inter = inter_h * inter_w                                    # [M, T]
    area_g = (gy2 - gy1) * (gx2 - gx1)
    area_a = (ay2 - ay1) * (ax2 - ax1)
    union = area_g + area_a - inter
    iou = jnp.where(inter == 0.0, 0.0, inter / union)            # [M, T]

    # invalid GT rows -> -1.0 (argmax_match's neg_inf); anchor padding
    # beyond num_anchors -> -2.0 so real anchors always win row maxes
    m, t = iou.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (m, t), 1)
    masked = jnp.where(valid, iou, -1.0)
    masked = jnp.where(col_local + g * block_t < num_anchors, masked, -2.0)

    # per-anchor: max over rows + FIRST row achieving it (jnp.argmax order)
    colmax = jnp.max(masked, axis=0, keepdims=True)              # [1, T]
    match = jnp.min(jnp.where(masked == colmax, row_ids, m), axis=0)
    # per-row: max over this block's anchors + FIRST anchor achieving it
    rowmax = jnp.max(masked, axis=1, keepdims=True)              # [M, 1]
    rowarg = jnp.min(jnp.where(masked == rowmax, col_local, t), axis=1)

    vals_ref[0, 0, 0, :] = colmax[0]
    match_ref[0, 0, 0, :] = match.astype(jnp.int32)
    rowmax_ref[0, 0, 0, :] = rowmax[:, 0]
    rowarg_ref[0, 0, 0, :] = rowarg.astype(jnp.int32) + g * block_t


def _targets_kernel(match_ref, gcls_ref, gy1_ref, gx1_ref, gy2_ref, gx2_ref,
                    ay1_ref, ax1_ref, ay2_ref, ax2_ref,
                    cls_ref, ty_ref, tx_ref, th_ref, tw_ref):
    mb = match_ref[0, 0]                                         # [1, T] i32
    gcls = gcls_ref[0]                                           # [M, 1] i32
    gy1 = gy1_ref[0]
    gx1 = gx1_ref[0]
    gy2 = gy2_ref[0]
    gx2 = gx2_ref[0]

    m = gcls.shape[0]
    t = mb.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0)
    onehot = row_ids == mb                                       # [M, T]
    positive = mb >= 0                                           # [1, T]

    def sel(p):                                                  # [M,1]->[1,T]
        return jnp.sum(jnp.where(onehot, p, 0.0), axis=0, keepdims=True)

    cls_sel = jnp.sum(jnp.where(onehot, gcls, 0), axis=0, keepdims=True)
    # ignore-band anchors (match == -2, unmatched_threshold <
    # match_threshold) keep their -2 code so the focal-loss mask fires
    # (ops/target_assigner.py label_anchors / reference loss.py:285)
    neg = jnp.where(mb == -2, -2, -1)
    cls_ref[0, 0] = jnp.where(positive, cls_sel - 1, neg)

    # encode_boxes (ops/box_coder.py): centers from raw h/w, eps added after
    by1, bx1, by2, bx2 = sel(gy1), sel(gx1), sel(gy2), sel(gx2)  # [1, T]
    ay1 = ay1_ref[:]
    ax1 = ax1_ref[:]
    ay2 = ay2_ref[:]
    ax2 = ax2_ref[:]
    ha_r = ay2 - ay1
    wa_r = ax2 - ax1
    yca = ay1 + 0.5 * ha_r
    xca = ax1 + 0.5 * wa_r
    ha = ha_r + EPS
    wa = wa_r + EPS
    h_r = by2 - by1
    w_r = bx2 - bx1
    yc = by1 + 0.5 * h_r
    xc = bx1 + 0.5 * w_r
    h = h_r + EPS
    w = w_r + EPS
    ty_ref[0, 0] = jnp.where(positive, (yc - yca) / ha, 0.0)
    tx_ref[0, 0] = jnp.where(positive, (xc - xca) / wa, 0.0)
    th_ref[0, 0] = jnp.where(positive, jnp.log(h / ha), 0.0)
    tw_ref[0, 0] = jnp.where(positive, jnp.log(w / wa), 0.0)


def _pad_anchor_planes(anchor_boxes, block_t):
    a = anchor_boxes.shape[0]
    grid_g = -(-a // block_t)
    a_pad = grid_g * block_t
    planes = jnp.pad(anchor_boxes.astype(jnp.float32),
                     ((0, a_pad - a), (0, 0)))
    return [planes[:, i].reshape(1, a_pad) for i in range(4)], grid_g, a_pad


@functools.partial(jax.jit, static_argnames=("block_t",))
def pallas_batch_match(
        anchor_boxes: jnp.ndarray,   # [A, 4] yxyx f32
        gt_boxes: jnp.ndarray,       # [B, M, 4] yxyx
        valid: jnp.ndarray,          # [B, M] bool
        block_t: int = _BLOCK_T,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused batched match step. Returns (matched_vals [B, A] f32,
    matches [B, A] int32 raw argmax rows, best_anchor_per_row [B, M])."""
    b, m, _ = gt_boxes.shape
    a = anchor_boxes.shape[0]
    (ay1, ax1, ay2, ax2), grid_g, a_pad = _pad_anchor_planes(
        anchor_boxes, block_t)

    gt = gt_boxes.astype(jnp.float32)
    gy1, gx1, gy2, gx2 = (gt[:, :, i][..., None] for i in range(4))  # [B,M,1]
    vmask = valid.astype(jnp.float32)[..., None]

    gt_spec = pl.BlockSpec((1, m, 1), lambda bi, gi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((1, block_t), lambda bi, gi: (0, gi),
                            memory_space=pltpu.VMEM)
    # singleton third axis keeps Mosaic's last-two-dims tiling rule happy
    col_spec = pl.BlockSpec((1, 1, 1, block_t), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, 1, m), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_match_kernel, num_anchors=a, block_t=block_t)
    vals, matches, rowmax, rowarg = pl.pallas_call(
        kernel,
        grid=(b, grid_g),
        out_shape=(
            jax.ShapeDtypeStruct((b, grid_g, 1, block_t), jnp.float32),
            jax.ShapeDtypeStruct((b, grid_g, 1, block_t), jnp.int32),
            jax.ShapeDtypeStruct((b, grid_g, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, grid_g, 1, m), jnp.int32),
        ),
        in_specs=[gt_spec] * 5 + [anc_spec] * 4,
        out_specs=(col_spec, col_spec, row_spec, row_spec),
        interpret=jax.default_backend() != "tpu",
    )(gy1, gx1, gy2, gx2, vmask, ay1, ax1, ay2, ax2)

    matched_vals = vals.reshape(b, a_pad)[:, :a]
    match_rows = matches.reshape(b, a_pad)[:, :a]
    rowmax = rowmax[:, :, 0, :]
    rowarg = rowarg[:, :, 0, :]
    # combine per-block row maxes; earliest block wins ties, and within a
    # block the earliest anchor won — global jnp.argmax first-wins order
    best_block = jnp.argmax(rowmax, axis=1)                          # [B, M]
    best_anchor = jnp.take_along_axis(
        rowarg, best_block[:, None, :], axis=1)[:, 0, :]             # [B, M]
    return matched_vals, match_rows, best_anchor


@functools.partial(jax.jit, static_argnames=("block_t",))
def pallas_batch_targets(
        anchor_boxes: jnp.ndarray,   # [A, 4] yxyx f32
        gt_boxes: jnp.ndarray,       # [B, M, 4]
        gt_classes: jnp.ndarray,     # [B, M] int32
        matches: jnp.ndarray,        # [B, A] final match codes
        block_t: int = _BLOCK_T,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Targets from final match codes without HBM gathers.

    Returns (cls_targets [B, A] int32 shifted by -1, box_targets [B, A, 4]).
    """
    b, m, _ = gt_boxes.shape
    a = anchor_boxes.shape[0]
    (ay1, ax1, ay2, ax2), grid_g, a_pad = _pad_anchor_planes(
        anchor_boxes, block_t)

    gt = gt_boxes.astype(jnp.float32)
    gy1, gx1, gy2, gx2 = (gt[:, :, i][..., None] for i in range(4))
    gcls = gt_classes.astype(jnp.int32)[..., None]                   # [B,M,1]
    mpad = jnp.pad(matches.astype(jnp.int32), ((0, 0), (0, a_pad - a)),
                   constant_values=-1).reshape(b, grid_g, 1, block_t)

    gt_spec = pl.BlockSpec((1, m, 1), lambda bi, gi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((1, block_t), lambda bi, gi: (0, gi),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, 1, 1, block_t), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)

    cls_t, ty, tx, th, tw = pl.pallas_call(
        _targets_kernel,
        grid=(b, grid_g),
        out_shape=(
            jax.ShapeDtypeStruct((b, grid_g, 1, block_t), jnp.int32),
        ) + tuple(jax.ShapeDtypeStruct((b, grid_g, 1, block_t), jnp.float32)
                  for _ in range(4)),
        in_specs=[col_spec, gt_spec, gt_spec, gt_spec, gt_spec, gt_spec,
                  anc_spec, anc_spec, anc_spec, anc_spec],
        out_specs=(col_spec,) * 5,
        interpret=jax.default_backend() != "tpu",
    )(mpad, gcls, gy1, gx1, gy2, gx2, ay1, ax1, ay2, ax2)

    cls_targets = cls_t.reshape(b, a_pad)[:, :a]
    box_targets = jnp.stack(
        [p.reshape(b, a_pad)[:, :a] for p in (ty, tx, th, tw)], axis=-1)
    return cls_targets, box_targets


def pallas_label_match(
        anchor_boxes: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_classes: jnp.ndarray,
        matched_threshold: float,
        unmatched_threshold: float,
) -> jnp.ndarray:
    """Batched match codes [B, A] (>=0 row, -1 unmatched, -2 ignored) with
    the reference's thresholds + force-match, via the fused kernel."""
    valid = gt_classes.astype(jnp.int32) > -1                        # [B, M]
    b, m = valid.shape
    a = anchor_boxes.shape[0]
    matched_vals, matches, best_anchor = pallas_batch_match(
        anchor_boxes, gt_boxes, valid)

    below = matched_vals < unmatched_threshold
    between = (matched_vals >= unmatched_threshold) & \
        (matched_vals < matched_threshold)
    matches = jnp.where(below, -1, matches)
    matches = jnp.where(between, -2, matches)

    # force-match: every valid GT row claims its best anchor; lowest row
    # index wins contested anchors (scatter-min, O(M) work per image)
    rows = jnp.arange(m, dtype=jnp.int32)

    def force(ba, vd):
        tgt = jnp.full((a,), m, jnp.int32)
        idx = jnp.where(vd, ba, a)          # invalid rows -> dropped (OOB)
        return tgt.at[idx].min(rows, mode="drop")

    force_row = jax.vmap(force)(best_anchor, valid)
    return jnp.where(force_row < m, force_row, matches)
