"""ProjectionNet: per-anchor embedding MLP + fixed positional encodings.

TPU-native redesign of the reference ProjectionNet
(effdet/efficientdet.py:697-762) and its per-level anchor-feature assembly
(infer.py:366-377, 570-580): an anchor's embedding input row is
[fpn cell feature (C) | level enc (6) | cell y enc (14) | cell x enc (14)
| anchor-id enc (8)] — see build_anchor_features; the anchor encoding
occupies the LAST 8 dims (the reference concatenates in the order
[feature | anchor | level | cell], infer.py:377 — a layout permutation
only, irrelevant to a from-scratch-trained MLP but it matters when
porting reference first-layer weights row-by-row).

Note on the cell encoding: the reference assembles it with a
cat+movedim+reshape sequence (infer.py:370-371) that interleaves y- and
x-encodings inconsistently across the flattened grid; here the intended
semantics — concat(enc_y(row), enc_x(col)) per cell — is implemented
directly. ``MetaConfig.ref_pos_enc`` opts into the reference-exact
arithmetic AND the reference row layout (see
``build_anchor_features(ref_pos_enc=True)``), pinned by a torch oracle
in tests/test_ref_compat_modes.py.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .config import MetaConfig


def _sinusoid_table(num_pos: int, step: float, num_freqs: int) -> np.ndarray:
    """Reference encoding scheme (efficientdet.py:705-730):
    locs = arange(-1, 1, step) * pi (truncated to num_pos), features
    [sin(2^f * loc), cos(2^f * loc)] for f in range(num_freqs)."""
    locs = (np.arange(-1.0, 1.0, step) * math.pi)[:num_pos]
    feats = []
    for f in range(num_freqs):
        feats.append(np.sin(2.0 ** f * locs))
        feats.append(np.cos(2.0 ** f * locs))
    return np.stack(feats, axis=1).astype(np.float32)   # [num_pos, 2*num_freqs]


ANCHOR_ENC = _sinusoid_table(9, 1.0 / 8, 4)     # [9, 8]
CELL_ENC = _sinusoid_table(80, 1.0 / 64, 7)     # [80, 14]
LEVEL_ENC = _sinusoid_table(5, 1.0 / 4, 3)      # [5, 6]

POS_DIM = 8 + 6 + 28


class ProjectionNet(nn.Module):
    """MLP: (fpn_channels + 42) -> width -> ... -> width/2, bias-free, ReLU.

    Also owns the confidence-gate scalars dot_mult/dot_add
    (efficientdet.py:702-703).
    """
    fpn_channels: int
    width: int = 512
    depth: int = 2
    dot_mult_init: float = 3.0
    dot_add_init: float = 3.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth - 1):
            x = nn.Dense(self.width, use_bias=False, name=f"dense_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.width // 2, use_bias=False,
                     name=f"dense_{self.depth - 1}")(x)
        return x

    def gate_params(self):
        """(dot_mult, dot_add) learnable scalars."""
        dot_mult = self.param("dot_mult",
                              nn.initializers.constant(self.dot_mult_init), ())
        dot_add = self.param("dot_add",
                             nn.initializers.constant(self.dot_add_init), ())
        return dot_mult, dot_add


class ProjectionGate(nn.Module):
    """Standalone holder for the dot_mult/dot_add confidence-gate scalars
    (kept separate from the MLP so the gate can be frozen independently,
    mirroring inner_thresh_train, infer.py:611-614)."""
    dot_mult_init: float = 3.0
    dot_add_init: float = 3.0

    @nn.compact
    def __call__(self, conf_logits: jnp.ndarray) -> jnp.ndarray:
        dot_mult = self.param("dot_mult",
                              nn.initializers.constant(self.dot_mult_init), ())
        dot_add = self.param("dot_add",
                             nn.initializers.constant(self.dot_add_init), ())
        return dot_mult * (conf_logits + dot_add)


def select_confident_anchors(feats, cls_out, meta_cfg,
                             labels_flat=None, level_sizes=None,
                             sep_out=None):
    """Per level, keep the top ``conf_keep_frac`` anchors by confidence
    (static k — the reference's quantile-adjust loop, infer.py:384-394);
    gather features, confidences and (optionally) flat anchor labels
    consistently. Levels whose grid is <= ``min_level_cells`` keep all
    anchors.

    ``sep_out`` (per-level, shaped like ``cls_out``) is a second logit set
    gathered at the SAME selected positions — the separate-head support
    path masks main-head confidences and sep-head class logits with one
    mask (reference infer.py:595-596: res_conf[mask] / res_cls[mask]).

    Shared by the phase-A projection loss (with labeler labels) and the
    phase-B support pseudo-loss (no labels): one copy of the
    select/gather logic, one place where the head-level / label-level
    alignment is enforced. Returns (rows, confs, labels, sep)."""
    with_labels = labels_flat is not None
    if with_labels:
        if not (len(feats) == len(cls_out) == len(level_sizes)):
            raise ValueError(
                f"level mismatch: {len(feats)} feature levels, "
                f"{len(cls_out)} head levels, {len(level_sizes)} label "
                "levels — the head must run with level_offset matching "
                "the anchor labeler's")
    sel_feats, sel_confs, sel_labels, sel_sep = [], [], [], []
    offset = 0
    for li, (level_feats, level_cls) in enumerate(zip(feats, cls_out)):
        b = level_cls.shape[0]
        conf = level_cls.reshape(b, -1)
        h = level_cls.shape[1]
        keep_all = h <= meta_cfg.min_level_cells
        idx, vals = confidence_topk(
            conf, meta_cfg.conf_keep_frac,
            min_keep_all=conf.shape[-1] if keep_all else 0)
        sel_confs.append(vals)
        sel_feats.append(jnp.take_along_axis(level_feats, idx[..., None],
                                             axis=1))
        if sep_out is not None:
            sep_flat = sep_out[li].reshape(b, -1)
            sel_sep.append(jnp.take_along_axis(sep_flat, idx, axis=1))
        if with_labels:
            lsz = level_sizes[li]
            if conf.shape[-1] != lsz:
                raise ValueError(
                    f"{conf.shape[-1]} anchors vs {lsz} labels in one "
                    "level: head/labeler level grids misaligned")
            lab_level = labels_flat[:, offset:offset + lsz]
            sel_labels.append(jnp.take_along_axis(lab_level, idx, axis=1))
            offset += lsz
    rows = jnp.concatenate(sel_feats, axis=1)
    confs = jnp.concatenate(sel_confs, axis=1)
    labels = jnp.concatenate(sel_labels, axis=1) if with_labels else None
    sep = jnp.concatenate(sel_sep, axis=1) if sep_out is not None else None
    return rows, confs, labels, sep


def _ref_interleaved_cell_enc(h: int, w: int,
                              cell: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact 28-d cell encoding (infer.py:370-371).

    The reference builds ``cat([enc_y bcast, enc_y bcast transposed],
    dim=2).reshape(-1, 28)`` — pairing CONSECUTIVE entries of a 2W-long
    row sequence [enc_y(h)]*W ++ [cell[0..W-1]]. Cell (y, x) therefore
    gets [S[2x], S[2x+1]] where S[k] = cell[y] if k < W else cell[k-W]:
    left-half cells encode (y, y) with NO x information; right-half
    cells encode an x-pair with NO y information. Requires H == W (the
    reference's torch.cat does too). Returns [h, w, 28]."""
    if h != w:
        raise ValueError(
            f"ref_pos_enc requires square feature maps, got {h}x{w} "
            "(the reference's torch.cat(dim=2) does too, infer.py:371)")
    j = jnp.arange(w)
    i1, i2 = 2 * j, 2 * j + 1
    y_rows = cell[:h][:, None, :]                       # [h,1,14]
    x1 = cell[jnp.clip(i1 - w, 0, None)][None]          # [1,w,14]
    x2 = cell[jnp.clip(i2 - w, 0, None)][None]
    e1 = jnp.where((i1 < w)[None, :, None], y_rows, x1)  # [h,w,14]
    e2 = jnp.where((i2 < w)[None, :, None], y_rows, x2)
    return jnp.concatenate([e1, e2], axis=-1)            # [h,w,28]


def build_anchor_features(
        level_embds: Sequence[jnp.ndarray],
        level_offset: int = 0,
        num_anchors: int = 9,
        ref_pos_enc: bool = False) -> List[jnp.ndarray]:
    """Per level: [B, H, W, C] head activations -> [B, H*W*A, C+42] anchor
    feature rows (cell feature repeated per anchor + positional encodings).

    ``level_offset`` indexes LEVEL_ENC for the first supplied level (the
    support path runs on levels min_level+supp_level_offset.., infer.py:569).

    ``ref_pos_enc`` switches to the reference-exact form (MetaConfig
    compat toggle): the interleaved cell encoding of
    :func:`_ref_interleaved_cell_enc` and the reference row layout
    [feature | anchor(8) | level(6) | cell(28)] (infer.py:377) instead
    of [feature | level | y | x | anchor]. Level indexing keeps this
    framework's offset-aligned semantics in both modes (the reference's
    0-based zip misalignment was adjudicated separately; see
    episode.py projection_phase_loss)."""
    anch = jnp.asarray(ANCHOR_ENC)          # [A, 8]
    cell = jnp.asarray(CELL_ENC)            # [80, 14]
    lev = jnp.asarray(LEVEL_ENC)            # [5, 6]

    out = []
    for li, embds in enumerate(level_embds):
        b, h, w, c = embds.shape
        lev_enc = jnp.broadcast_to(lev[min(level_offset + li, lev.shape[0] - 1)],
                                   (b, h, w, 6))
        if ref_pos_enc:
            cell_enc = jnp.broadcast_to(
                _ref_interleaved_cell_enc(h, w, cell)[None], (b, h, w, 28))
            per_cell = jnp.concatenate([embds, lev_enc, cell_enc], axis=-1)
        else:
            y_enc = jnp.broadcast_to(cell[:h][None, :, None, :], (b, h, w, 14))
            x_enc = jnp.broadcast_to(cell[:w][None, None, :, :], (b, h, w, 14))
            per_cell = jnp.concatenate([embds, lev_enc, y_enc, x_enc], axis=-1)
        per_cell = per_cell.reshape(b, h * w, 1, c + 34)
        per_cell = jnp.broadcast_to(per_cell, (b, h * w, num_anchors, c + 34))
        anch_enc = jnp.broadcast_to(anch[None, None, :, :],
                                    (b, h * w, num_anchors, 8))
        if ref_pos_enc:
            # reference order: [feature | anchor | level | cell]
            # (infer.py:377 torch.cat([rep_embds, anch_enc, lev_enc,
            # cell_enc], dim=1))
            rows = jnp.concatenate(
                [per_cell[..., :c], anch_enc, per_cell[..., c:]], axis=-1)
        else:
            rows = jnp.concatenate([per_cell, anch_enc], axis=-1)
        out.append(rows.reshape(b, h * w * num_anchors, c + POS_DIM))
    return out


def confidence_topk(conf_logits: jnp.ndarray, keep_frac: float,
                    min_keep_all: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static top-k per image over [B, A] confidence logits.

    Replaces the reference's dynamic quantile-adjust loop (infer.py:384-394,
    quantile 0.875 ~ keep 12.5%) with an exact static top-k — fixed shapes
    for XLA. Returns (indices [B, K], values [B, K]).
    """
    a = conf_logits.shape[-1]
    if min_keep_all and a <= min_keep_all:
        k = a
    else:
        k = max(1, int(round(a * keep_frac)))
    vals, idx = jax.lax.top_k(conf_logits, k)
    return idx, vals
