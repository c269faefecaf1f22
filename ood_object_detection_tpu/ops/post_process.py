"""Batched fixed-shape detection post-processing.

TPU-native redesign of the reference pipeline
(_post_process effdet/bench.py:12-56 -> per-image generate_detections
effdet/anchors.py:95-172 with a Python batch loop at bench.py:59-76):
here the whole path — level concat, global top-k, box decode, clip, score
filter, (soft-)NMS, OOD scoring — is one jitted, vmapped graph emitting a
fixed [B, max_det, 6] tensor, so it shards trivially under pjit and never
syncs with the host.

Detection rows are [xmin, ymin, xmax, ymax, score, class] with class ids
shifted up by 1 (background = 0), the reference output convention
(effdet/anchors.py:156). Padding rows have score == 0.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .box_coder import decode_boxes
from .boxes import clip_boxes_xyxy
from .nms import nms_fixed, soft_nms_fixed
from .ood import _SCORERS, ood_score

MIN_SCORE = 0.01   # reference score pre-filter (effdet/anchors.py:141)
# Offset/NMS coordinate guard: far above any real image coordinate, far
# below f32 inf — keeps 0 * max_coord from producing NaN when a diverged
# head decodes to exp-overflowed boxes (callers without img_info skip the
# image clip, so inf coordinates can reach the class-offset trick).
MAX_COORD = 1e7


def _check_ood_method(ood_method: Optional[str]) -> None:
    """Fail at trace time on unknown OOD methods for EVERY dtype path.

    The bf16 packed-key fast path derives max_logit/msp from the packed
    key and only runs the fused reduce for energy — without this check an
    unrecognized method would silently fall through to msp semantics
    there, while the f32 path raises KeyError inside ood_score.
    """
    if ood_method is not None and ood_method not in _SCORERS:
        raise ValueError(
            f"unknown ood_method {ood_method!r}; expected one of "
            f"{sorted(_SCORERS)}")


def _anchor_ood_reduce(cls_outputs: List[jnp.ndarray], num_classes: int,
                       ood_method: str) -> jnp.ndarray:
    """Per-anchor OOD score only: [B, A_tot] f32, no max/argmax work.

    Same NHWC-native per-level class-axis reduction as _per_anchor_reduce
    but computing just the requested score — used when the selection path
    already has its own (anchor, class) choice (the 'approx' pair top-k)
    and only the OOD channel is needed.
    """
    oods = []
    for lvl in cls_outputs:
        b, h, w, _ = lvl.shape
        r = lvl.reshape(b, h, w, -1, num_classes)
        oods.append(ood_score(r.astype(jnp.float32), ood_method)
                    .reshape(b, -1))
    return jnp.concatenate(oods, axis=1)


def _per_anchor_reduce(cls_outputs: List[jnp.ndarray], num_classes: int,
                       ood_method: Optional[str] = None):
    """Class-axis reductions per anchor without materializing [B, A, C].

    Each level's [B, H, W, A*C] tensor is viewed as [B, H, W, A, C] (a
    tile-friendly split of the trailing dim) and reduced over C on the VPU.
    This avoids the huge relayout the pair-topk path pays to concatenate
    [B, A_total, C] (~30 ms for D0@512 bs=32 on v5e vs ~2 ms this way).

    Returns (max_logit [B, A_tot], argmax_class [B, A_tot],
             ood [B, A_tot] or None).
    """
    maxes, args = [], []
    for lvl in cls_outputs:
        b, h, w, _ = lvl.shape
        r = lvl.reshape(b, h, w, -1, num_classes)
        maxes.append(jnp.max(r, axis=-1).reshape(b, -1))
        args.append(jnp.argmax(r, axis=-1).astype(jnp.int32).reshape(b, -1))
    max_all = jnp.concatenate(maxes, axis=1)
    arg_all = jnp.concatenate(args, axis=1)
    # XLA multi-output-fuses this reduce with the max/argmax above (same
    # per-level [B,H,W,A,C] views) — one HBM read of the logits.
    ood_all = (_anchor_ood_reduce(cls_outputs, num_classes, ood_method)
               if ood_method is not None else None)
    return max_all, arg_all, ood_all


def _packed_f32_key_reduce(cls_outputs: List[jnp.ndarray],
                           num_classes: int,
                           ood_method: Optional[str] = None,
                           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-anchor (max logit, argmax class) packed into ONE exact f32 key.

    key = mono16(logit) * 256 + (255 - class), where mono16 is the
    order-preserving u16 transform of the bf16 logit bits. The key spans
    [0, 2^24) — every value is exactly representable in f32 (24-bit
    mantissa), so ``approx_max_k`` on the keys returns *values that carry
    both fields*: no post-top-k class gather is needed. TPU lane-dim
    gathers at 5k indices/row cost ~7 ms at bs=128 (the single most
    expensive op in the old post-process) — this removes that entirely.

    Ordering: logit-major; ties break to the lowest class id (the argmax
    convention). Requires num_classes <= 256 (covers COCO-90/LVIS-250).

    ``ood_method``: when an OOD score is requested that needs its own
    class-axis reduce (energy), it is computed HERE, from the same
    [B, H, W, A, C] view in the same traced expression, so XLA
    multi-output-fuses both reductions into one HBM read of the logits
    (measured: a separate post-NMS reduce costs a full second pass,
    ~7 ms at D0@512 bs=128 — the logits are >1 GB). max_logit / msp need
    no second reduce at all: they are derived later from the packed key
    itself (the key already carries the per-anchor max logit bit-exactly).

    Returns (key_all [B, A_tot] f32, ood_all [B, A_tot] f32 or None);
    decode keys with _unpack_f32_key.
    """
    assert num_classes <= 256
    keys = []
    for lvl in cls_outputs:
        b, h, w, _ = lvl.shape
        r = lvl.reshape(b, h, w, -1, num_classes)
        if r.dtype != jnp.bfloat16:
            r = r.astype(jnp.bfloat16)
        # Integer key math: the i32 max is taken FIRST and only the tiny
        # [B, A] result is converted to f32 (exact: keys span [0, 2^24)).
        # Converting the full tensor to f32 before the reduce — the old
        # form — gave the convert two reduce consumers (key max + energy),
        # which made XLA materialize the f32 tensor to HBM (~4 ms at
        # D0@512 bs=128) instead of fusing; with i32 keys each reduce
        # fuses straight against the bf16 logits.
        bits = jax.lax.bitcast_convert_type(r, jnp.uint16).astype(jnp.int32)
        mono = jnp.where(bits >= 0x8000, 0xFFFF - bits, bits | 0x8000)
        cls_ids = jax.lax.broadcasted_iota(jnp.int32, r.shape, 4)
        key = mono * 256 + (255 - cls_ids)
        keys.append(jnp.max(key, axis=-1).astype(jnp.float32)
                    .reshape(b, -1))
    key_all = jnp.concatenate(keys, axis=1)
    # fused OOD reduce over the same per-level views (one HBM read)
    ood_all = (_anchor_ood_reduce(cls_outputs, num_classes, ood_method)
               if ood_method is not None else None)
    return key_all, ood_all


def _unpack_f32_key(vals: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of _packed_f32_key_reduce: f32 keys -> (logit f32, class i32)."""
    mono16 = jnp.floor(vals * (1.0 / 256.0))
    rem = vals - mono16 * 256.0
    classes = (255.0 - rem).astype(jnp.int32)
    mono = mono16.astype(jnp.uint32)
    neg = mono < 0x8000
    bits = jnp.where(neg, 0xFFFF - mono, mono & 0x7FFF)
    logits = jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return logits, classes


def _gather_class_rows(cls_outputs: List[jnp.ndarray], num_classes: int,
                       anchor_ids: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, K, C] class-logit rows for K global anchor ids.

    Reshapes each level to an anchor-major [B, N_l, C] view and
    row-gathers exactly the K requested anchors, so it scales to the
    exact-top-k candidate set. Returns f32 (exact for f32 and bf16
    inputs).
    """
    b, k = anchor_ids.shape
    out = jnp.zeros((b, k, num_classes), jnp.float32)
    offset = 0
    for lvl in cls_outputs:
        _, h, w, ac = lvl.shape
        n = h * w * (ac // num_classes)
        view = lvl.reshape(b, n, num_classes)
        local = jnp.clip(anchor_ids - offset, 0, n - 1)
        rows = jnp.take_along_axis(view, local[..., None], axis=1)
        in_level = (anchor_ids >= offset) & (anchor_ids < offset + n)
        out = jnp.where(in_level[..., None], rows.astype(jnp.float32), out)
        offset += n
    return out


def _exact_topk_pairs(cls_outputs: List[jnp.ndarray], num_classes: int,
                      k: int, ood_method: Optional[str] = None):
    """Exact global top-k over all (anchor, class) pairs, two-stage.

    Reference semantics: torch.topk over the flattened [B, A*C] logits
    (effdet/bench.py:12-56). A literal translation sorts ~4.4M elements
    per image (D0/COCO) — 122 img/s on v5e. Instead:

      1. per-anchor class max in the native NHWC layout (VPU reduce);
      2. exact ``lax.top_k`` over the A per-anchor maxes -> k1 anchors;
      3. row-gather those k1 anchors' C-wide logit rows;
      4. exact ``lax.top_k`` over the k1*C candidate pairs.

    Stage 2 is a valid exact filter: any pair in the global top-k has
    value >= T* (the k-th pair value), so its anchor's max >= T*; every
    anchor with max >= T* owns at least one top-k pair, so there are at
    most k of them — all inside the top-k1=min(k, A) anchors. The sort
    shrinks from A*C to max(A, k*C) elements (~10-90x). Values are exact
    (no bf16 key packing); for inputs with exact value ties at the k-th
    boundary the *choice among tied pairs* may differ from the flat sort
    (anchor-max rank vs flat index order) — indistinguishable for
    continuous logits.

    Returns (vals [B,k] descending, anchor_ids [B,k], classes [B,k],
    ood_all [B, A_tot] or None — when ``ood_method`` is set the OOD
    class-reduce shares the stage-1 pass over the logits, so the
    post-process never reads them a second time).
    """
    batch = cls_outputs[0].shape[0]
    max_all, _, ood_all = _per_anchor_reduce(cls_outputs, num_classes,
                                             ood_method=ood_method)
    a_tot = max_all.shape[1]
    k = min(k, a_tot * num_classes)
    k1 = min(k, a_tot)
    _, top_anchors = jax.lax.top_k(max_all, k1)          # [B, k1]
    rows = _gather_class_rows(cls_outputs, num_classes, top_anchors)
    flat = rows.reshape(batch, k1 * num_classes)
    vals, pos = jax.lax.top_k(flat, k)                   # [B, k]
    classes = (pos % num_classes).astype(jnp.int32)
    anchor_ids = jnp.take_along_axis(top_anchors, pos // num_classes, axis=1)
    return vals, anchor_ids, classes, ood_all


def _gather_survivor_scores(ood_all: jnp.ndarray, keep_idx: jnp.ndarray,
                            indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-anchor scores [B, A_tot] for the NMS survivors.

    Two tiny [B, max_det] scalar gathers (keep_idx -> candidate slot ->
    global anchor id); padding rows get 0.
    """
    valid = keep_idx >= 0
    surv_anchor_ids = jnp.take_along_axis(
        indices, jnp.clip(keep_idx, 0), axis=1)           # [B, max_det]
    gathered = jnp.take_along_axis(ood_all, surv_anchor_ids, axis=1)
    return jnp.where(valid, gathered, 0.0)


def post_process(
        cls_outputs: List[jnp.ndarray],
        box_outputs: List[jnp.ndarray],
        num_classes: int,
        max_detection_points: int = 5000,
        topk_method: str = "per_anchor",
        topk_recall: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select global top-k candidates across all levels.

    Args:
      cls_outputs: per-level [B, H, W, A*C] class logits (NHWC).
      box_outputs: per-level [B, H, W, A*4] box regressions.
      topk_method:
        'per_anchor' (default, fastest): reduce classes per anchor first
          (max/argmax on the VPU), then approx top-k over anchors — each
          anchor contributes its best class. ~15x faster than the pair
          selection on v5e; differs from the reference only when one
          anchor's 2nd-best class would out-score another anchor's best.
        'approx': reference (anchor, class)-pair semantics with
          approx_max_k over the flattened pairs.
        'exact': bit-faithful reference top-k (full sort).

    Returns (cls_topk [B,k,1] winning-class logits, box_topk [B,k,4],
             anchor_indices [B,k], classes [B,k]) — the reference
    _post_process contract (bench.py:12-56).
    """
    cls_topk, box_topk, indices, classes, _ = _select_topk(
        cls_outputs, box_outputs, num_classes, max_detection_points,
        topk_method, topk_recall)
    return cls_topk, box_topk, indices, classes


def _select_topk(cls_outputs: List[jnp.ndarray],
                 box_outputs: List[jnp.ndarray],
                 num_classes: int,
                 max_detection_points: int,
                 topk_method: str,
                 topk_recall: float,
                 ood_method: Optional[str] = None):
    """Shared top-k candidate selection (the single implementation behind
    post_process and generate_detections, so a tie-break or recall fix in
    one entry point cannot drift from the other).

    Returns (cls_topk [B,k,1], box_topk [B,k,4], indices [B,k],
    classes [B,k], ood_all [B, A_tot] f32 or None). When ``ood_method``
    is set the per-anchor OOD reduce shares the selection pass over the
    logits wherever the method already reads them (per_anchor/exact), and
    runs as a single dedicated reduce for the 'approx' pair path.
    """
    batch = cls_outputs[0].shape[0]

    if topk_method == "per_anchor":
        max_all, arg_all, ood_all = _per_anchor_reduce(
            cls_outputs, num_classes, ood_method=ood_method)
        k = min(max_detection_points, max_all.shape[1])
        vals, indices = jax.lax.approx_max_k(
            max_all, k, recall_target=topk_recall, aggregate_to_topk=True)
        classes = jnp.take_along_axis(arg_all, indices, axis=1)
        cls_topk = vals[..., None]
    elif topk_method == "exact":
        vals, indices, classes, ood_all = _exact_topk_pairs(
            cls_outputs, num_classes, max_detection_points,
            ood_method=ood_method)
        cls_topk = vals[..., None]
    else:
        cls_all = jnp.concatenate(
            [lvl.reshape(batch, -1, num_classes) for lvl in cls_outputs],
            axis=1)
        flat = cls_all.reshape(batch, -1)                   # [B, A*C]
        _, topk_flat = jax.lax.approx_max_k(
            flat, max_detection_points, recall_target=topk_recall,
            aggregate_to_topk=True)
        indices = topk_flat // num_classes                  # anchor ids [B,k]
        classes = topk_flat % num_classes                   # class ids [B,k]
        cls_full = jnp.take_along_axis(cls_all, indices[..., None], axis=1)
        cls_topk = jnp.take_along_axis(cls_full, classes[..., None], axis=2)
        ood_all = (_anchor_ood_reduce(cls_outputs, num_classes, ood_method)
                   if ood_method is not None else None)

    box_all = jnp.concatenate(
        [lvl.reshape(batch, -1, 4) for lvl in box_outputs], axis=1)
    box_topk = jnp.take_along_axis(box_all, indices[..., None], axis=1)
    return cls_topk, box_topk, indices, classes, ood_all


@partial(jax.jit, static_argnames=(
    "max_det_per_image", "soft_nms", "iou_threshold", "has_img_info",
    "nms_impl"))
def batch_detection(
        cls_logits: jnp.ndarray,     # [B, k, 1]
        box_out: jnp.ndarray,        # [B, k, 4]
        anchor_boxes: jnp.ndarray,   # [A, 4]
        indices: jnp.ndarray,        # [B, k]
        classes: jnp.ndarray,        # [B, k]
        img_scale: Optional[jnp.ndarray] = None,     # [B] or [B,1]
        img_size: Optional[jnp.ndarray] = None,      # [B, 2] (w, h)
        max_det_per_image: int = 100,
        soft_nms: bool = False,
        iou_threshold: float = 0.3,
        has_img_info: bool = False,
        nms_impl: str = "auto",
        anchors_sel: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully batched detection -> ([B, max_det, 6], [B, max_det] keep).

    (Replaces the reference's torchscript per-image loop bench.py:59-76.)
    ``nms_impl``: 'pallas' = fused VMEM kernel (TPU), 'xla' = lax loop,
    'auto' = pallas on TPU backends. ``anchors_sel`` ([B, k, 4]) skips
    the anchor-table gather when the caller reconstructed anchors
    arithmetically (Anchors.boxes_for_indices).
    """
    # symbolic batch dim (jax.export shape polymorphism): the Pallas grid
    # and its VMEM batch-chunking need a concrete batch, so 'auto' falls
    # back to the bit-equal lax NMS; an explicit 'pallas' request fails
    # loudly inside the kernel instead of silently switching.
    static_batch = isinstance(cls_logits.shape[0], int)
    use_pallas = nms_impl == "pallas" or (
        nms_impl == "auto" and static_batch
        and jax.default_backend() == "tpu")

    if anchors_sel is None:
        # HAZARD (XLA:TPU, observed on libtpu 0.0.34): a flat gather from
        # the anchor table by in-graph top-k/approx_max_k indices gets
        # rewritten with AssumeGatherIndicesInBound + bitpacked index DMA.
        # The assumption is applied to the PADDED index buffer (e.g.
        # s32[80896] for a logical [16,5000]) whose pad lanes hold garbage
        # from previous buffer contents — data-dependently out-of-bounds,
        # which halts the TPU ("TPU worker process crashed... kernel
        # fault"). Reproduced deterministically from a trained D0@256
        # checkpoint; no index clamp / optimization_barrier / dtype
        # laundering removes the rewrite (the range proof is structural).
        # Every in-tree caller therefore passes `anchors_sel` (or an
        # Anchors via generate_detections), which rebuilds the selected
        # anchor boxes arithmetically — no table gather at all, and
        # faster (~3.5 ms saved at [128, 5000] on v5e). This fallback is
        # kept for API compatibility with raw anchor tables; prefer
        # passing `anchors=`.
        anchors_sel = anchor_boxes[indices]                      # [B, k, 4]
    boxes = decode_boxes(box_out.astype(jnp.float32), anchors_sel,
                         output_xyxy=True)
    if has_img_info:
        img_scale = img_scale.reshape(img_scale.shape[0], -1)[:, :1]
        size_hw = (img_size / img_scale)[:, None, ::-1]          # [B, 1, 2]
        boxes = clip_boxes_xyxy(boxes, size_hw)

    scores = jax.nn.sigmoid(cls_logits[..., 0].astype(jnp.float32))
    scores = jnp.where(scores > MIN_SCORE, scores, 0.0)          # [B, k]

    # per-image class offset (soft_nms.py:159-165, batched). Coordinates
    # are clamped to MAX_COORD first: without img_info no clip ran, and a
    # diverged head's exp-overflowed (inf) coordinate would make
    # max_coord = inf, giving class 0 an offset of 0 * inf = NaN — every
    # IoU against NaN boxes is False, so class-0 duplicates would never
    # suppress each other. No-op for any real image geometry.
    nms_boxes = jnp.clip(boxes, -MAX_COORD, MAX_COORD)
    max_coord = jnp.max(nms_boxes, axis=(1, 2), keepdims=True)
    offsets = classes.astype(boxes.dtype)[..., None] * (max_coord + 1.0)
    offset_boxes = nms_boxes + offsets

    if use_pallas:
        from .pallas_nms import pallas_batched_nms
        keep_idx, keep_scores = pallas_batched_nms(
            offset_boxes, scores, max_out=max_det_per_image,
            iou_threshold=iou_threshold, soft=soft_nms)
    elif soft_nms:
        keep_idx, keep_scores = jax.vmap(
            lambda bb, ss: soft_nms_fixed(
                bb, ss, max_det_per_image, method_gaussian=True,
                iou_threshold=iou_threshold, score_threshold=0.001)
        )(offset_boxes, scores)
    else:
        keep_idx, keep_scores = jax.vmap(
            lambda bb, ss: nms_fixed(bb, ss, iou_threshold, max_det_per_image)
        )(offset_boxes, scores)

    valid = keep_idx >= 0
    safe = jnp.clip(keep_idx, 0)
    out_boxes = jnp.where(
        valid[..., None],
        jnp.take_along_axis(boxes, safe[..., None], axis=1), 0.0)
    out_scores = jnp.where(valid, keep_scores, 0.0)
    out_classes = jnp.where(
        valid,
        jnp.take_along_axis(classes, safe, axis=1).astype(jnp.float32) + 1.0,
        0.0)
    if has_img_info:
        out_boxes = out_boxes * img_scale[..., None]

    detections = jnp.concatenate(
        [out_boxes, out_scores[..., None], out_classes[..., None]], axis=-1)
    return detections, keep_idx


def generate_detections(
        cls_outputs: List[jnp.ndarray],
        box_outputs: List[jnp.ndarray],
        anchor_boxes: jnp.ndarray,
        num_classes: int,
        img_scale: Optional[jnp.ndarray] = None,
        img_size: Optional[jnp.ndarray] = None,
        max_detection_points: int = 5000,
        max_det_per_image: int = 100,
        soft_nms: bool = False,
        iou_threshold: float = 0.3,
        ood_method: Optional[str] = None,
        topk_method: str = "per_anchor",
        topk_recall: float = 0.95,
        nms_impl: str = "auto",
        anchors=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full fused post-process: head outputs -> ([B,max_det,6], ood [B,max_det]).

    ``anchors``: optional ops.anchors.Anchors — when given, the selected
    anchors are reconstructed from the top-k ids by index arithmetic
    (Anchors.boxes_for_indices) instead of a table gather.

    When ``ood_method`` is set, each kept detection also gets an OOD score
    (energy / max_logit / msp over its anchor's full class-logit row),
    computed as a per-anchor class-axis reduction *before* any gather —
    no [B, A, C] buffer is ever materialized; padding rows get 0.
    """
    _check_ood_method(ood_method)
    if topk_method == "per_anchor":
        # single packed-key pass over the logits: (max logit, class) per
        # anchor in one u32 reduce. The u32 key holds bf16 logit bits —
        # exact for bf16 compute; f32 logits use the two-reduce path to
        # avoid rounding the selection scores.
        batch = cls_outputs[0].shape[0]
        if cls_outputs[0].dtype == jnp.bfloat16 and num_classes <= 256:
            # single-key path: top-k VALUES carry (logit, class) — no
            # post-top-k class gather (saves ~7 ms at bs=128 on v5e).
            # energy OOD folds its logsumexp into the SAME reduce pass
            # (one HBM read of the logits instead of two — another ~7 ms
            # at bs=128); max_logit/msp need no reduce at all — they are
            # recovered from the packed key after NMS.
            fused_ood = ood_method if ood_method == "energy" else None
            key_all, ood_all = _packed_f32_key_reduce(
                cls_outputs, num_classes, ood_method=fused_ood)
            k = min(max_detection_points, key_all.shape[1])
            vals, indices = jax.lax.approx_max_k(
                key_all, k, recall_target=topk_recall, aggregate_to_topk=True)
            logits, classes = _unpack_f32_key(vals)
            cls_topk = logits[..., None]
            if box_outputs[0].dtype == jnp.bfloat16:
                # gather the 4 bf16 box regressions as 2 u32 words: half
                # the gathered elements (lane-dim gathers pay per element)
                box_all = jnp.concatenate(
                    [lvl.reshape(batch, -1, 2, 2) for lvl in box_outputs],
                    axis=1)
                packed = jax.lax.bitcast_convert_type(box_all, jnp.uint32)
                picked = jnp.take_along_axis(
                    packed, indices[..., None], axis=1)      # [B, k, 2]
                box_topk = jax.lax.bitcast_convert_type(
                    picked, jnp.bfloat16).reshape(batch, k, 4)
            else:
                box_all = jnp.concatenate(
                    [lvl.reshape(batch, -1, 4) for lvl in box_outputs],
                    axis=1)
                box_topk = jnp.take_along_axis(
                    box_all, indices[..., None], axis=1)
            anchors_sel = anchors.boxes_for_indices(indices) \
                if anchors is not None else None
            detections, keep_idx = batch_detection(
                cls_topk, box_topk, jnp.asarray(anchor_boxes), indices,
                classes, img_scale=img_scale, img_size=img_size,
                max_det_per_image=max_det_per_image, soft_nms=soft_nms,
                iou_threshold=iou_threshold,
                has_img_info=img_scale is not None and img_size is not None,
                nms_impl=nms_impl, anchors_sel=anchors_sel)
            if ood_method is None:
                return detections, None
            if ood_all is not None:               # energy: fused reduce
                return detections, _gather_survivor_scores(
                    ood_all, keep_idx, indices)
            # max_logit / msp: the packed key already carries each
            # anchor's max (bf16) logit — unpack the survivors' keys.
            # msp = max_c sigmoid(l_c) = sigmoid(max_c l_c) (monotonic).
            surv_keys = _gather_survivor_scores(key_all, keep_idx, indices)
            logit, _ = _unpack_f32_key(surv_keys)
            score = logit if ood_method == "max_logit" \
                else jax.nn.sigmoid(logit)
            return detections, jnp.where(keep_idx >= 0, score, 0.0)

    # f32 per_anchor / exact / approx: the shared selection path
    cls_topk, box_topk, indices, classes, ood_all = _select_topk(
        cls_outputs, box_outputs, num_classes, max_detection_points,
        topk_method, topk_recall, ood_method=ood_method)

    anchors_sel = anchors.boxes_for_indices(indices) \
        if anchors is not None else None
    detections, keep_idx = batch_detection(
        cls_topk, box_topk, jnp.asarray(anchor_boxes), indices, classes,
        img_scale=img_scale, img_size=img_size,
        max_det_per_image=max_det_per_image, soft_nms=soft_nms,
        iou_threshold=iou_threshold,
        has_img_info=img_scale is not None and img_size is not None,
        nms_impl=nms_impl, anchors_sel=anchors_sel)

    ood = None
    if ood_all is not None:
        ood = _gather_survivor_scores(ood_all, keep_idx, indices)
    return detections, ood
