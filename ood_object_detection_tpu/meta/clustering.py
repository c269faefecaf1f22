"""Confidence-gated similarity clustering for pseudo-labeling web supports.

Fixed-shape jnp port of the clustering core shared by the reference's
projection-pretraining phase (infer.py:421-472) and its inner-loop
pseudo-target construction (infer.py:606-654):

  1. L2-normalize anchor embeddings, form the full similarity matrix.
  2. Gate similarities by a learned confidence threshold
     sigmoid(dot_mult * (conf + dot_add)) as an outer product.
  3. Pick each image's champion anchor (argmax mean gated similarity).
  4. Validate champions by mutual cluster coherence, refine once against
     the valid subset, and emit per-anchor soft pseudo-targets.

The reference's boolean fancy-indexing over the dynamic ``valid`` champion
subset becomes masked reductions — everything is fixed-shape and jittable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClusterResult:
    target: jnp.ndarray          # [M] per-anchor soft pseudo-target
    soft_thresh: jnp.ndarray     # [M] sigmoid confidence gate
    champion_idx: jnp.ndarray    # [S] refined per-image champion (flat idx)
    champion_coherence: jnp.ndarray   # [S] refined champion cluster quality
    valid_count: jnp.ndarray     # [] number of valid initial champions
    champ_sims: jnp.ndarray      # [M, S] similarities to refined champions
    target_clust: jnp.ndarray    # [M] per-anchor cluster-quality factor
    champion_target_clust: jnp.ndarray   # [S] refined champions' cluster quality


jax.tree_util.register_dataclass(
    ClusterResult,
    data_fields=["target", "soft_thresh", "champion_idx",
                 "champion_coherence", "valid_count", "champ_sims",
                 "target_clust", "champion_target_clust"],
    meta_fields=[])


def cluster_pseudo_targets(
        embeddings: jnp.ndarray,      # [S, K, D] per-image anchor embeddings
        conf_logits: jnp.ndarray,     # [S, K] confidence logits
        dot_mult: jnp.ndarray,
        dot_add: jnp.ndarray,
        sim_thresh: Optional[float] = None,
        refine_reduce: str = "sum",   # 'sum' (inner loop) | 'mean' (phase A)
        sim_target: str = "max",
        gate_stop_grad: bool = False) -> ClusterResult:
    """Cluster S*K anchors into one task cluster, emit soft targets.

    When ``sim_thresh`` is None, champion validity uses avg_init > mean
    (projection phase, infer.py:438); otherwise avg_init > sim_thresh
    (inner loop, infer.py:631).

    MEMORY: the full [M, M] similarity matrix is never formed. Every use
    of it is either a champion-column gather (sim[:, champs] =
    embds @ embds[champs].T, [M, S]) or a mean over ALL anchors, which
    factorizes exactly: mean_j(t_j * e_i.e_j) = e_i . (sum_j t_j e_j)/M
    — one [D] matvec instead of an [M, M] matmul. At the reference
    episode shape (25 supports x 1512 kept anchors -> M = 37800) the
    naive form needs a 5.3 GB f32 sim_mat plus a 6.9 GB [S, K, M]
    reshape and does not fit a 16 GB v5e chip; the factorized form peaks
    at the [M, S] champion columns (3.8 MB) and turns the O(M^2 D)
    similarity FLOPs into O(M D). Values match the naive form to f32
    summation order (same math, different association).
    """
    s, k, d = embeddings.shape
    m = s * k

    embds = embeddings.reshape(m, d)
    embds = embds / jnp.maximum(
        jnp.linalg.norm(embds, axis=-1, keepdims=True), 1e-12)

    conf_flat = conf_logits.reshape(m)
    soft_logits = dot_mult * (conf_flat + dot_add)
    soft_thresh = jax.nn.sigmoid(soft_logits)
    if gate_stop_grad:
        soft_thresh = jax.lax.stop_gradient(soft_thresh)

    # initial champions: per image, anchor with max mean gated similarity
    # mean_j(t_i t_j e_i.e_j) = t_i * (e_i . sum_j(t_j e_j)) / M
    gated_sum = embds.T @ soft_thresh                            # [D]
    img_avg_all = (soft_thresh * (embds @ gated_sum) / m).reshape(s, k)
    max_local = jnp.argmax(img_avg_all, axis=1)                 # [S]
    base = jnp.arange(s, dtype=max_local.dtype) * k
    champ0 = base + max_local                                   # [S]

    champ0_embds = embds[champ0]                                # [S, D]
    init_cluster = champ0_embds @ champ0_embds.T                # [S, S]
    avg_init = jnp.mean(init_cluster, axis=1) - 1.0 / s
    if sim_thresh is None:
        valid = avg_init > jnp.mean(avg_init)
    else:
        valid = avg_init > sim_thresh
    valid_f = valid.astype(embds.dtype)
    valid_count = jnp.sum(valid_f)
    denom = jnp.maximum(valid_count, 1.0)

    # masked column subset: mean/sum over valid champions only
    champ_cols = embds @ champ0_embds.T                         # [M, S]
    target_clust_all = jnp.sum(champ_cols * valid_f[None, :], axis=1) / denom

    # w_champ[i, j] = t_i * t_{champ0_j} * sim[i, champ0_j] * valid_j
    w_champ = (soft_thresh[:, None] * champ_cols
               * (soft_thresh[champ0] * valid_f)[None, :]).reshape(s, k, s)
    if refine_reduce == "sum":
        img_clust = jnp.sum(w_champ, axis=2)
    else:
        img_clust = jnp.sum(w_champ, axis=2) / denom
    max_local = jnp.argmax(img_clust, axis=1)
    champs = base + max_local                                   # refined [S]

    target_clust_champ = target_clust_all[champs]               # [S]
    champ_embds = embds[champs]                                 # [S, D]
    refined_cluster = champ_embds @ champ_embds.T
    champion_coherence = jnp.mean(refined_cluster, axis=1) - 1.0 / s

    champ_sims = embds @ champ_embds.T                          # [M, S]
    if sim_target == "max":
        all_max = jnp.max(champ_sims, axis=1)                   # [M]
        all_arg = jnp.argmax(champ_sims, axis=1)                # [M]
        target = soft_thresh * target_clust_champ[all_arg] * all_max
        target_clust = target_clust_champ[all_arg]
    else:  # 'avg'
        all_avg = jnp.mean(champ_sims, axis=1)
        target = soft_thresh * all_avg
        target_clust = all_avg

    return ClusterResult(
        target=target,
        soft_thresh=soft_thresh,
        champion_idx=champs,
        champion_coherence=champion_coherence,
        valid_count=valid_count,
        champ_sims=champ_sims,
        target_clust=target_clust,
        champion_target_clust=target_clust_champ)


def weighted_median(embds: jnp.ndarray, confs: jnp.ndarray,
                    stop_gradient: bool = True):
    """Confidence-weighted median per embedding dim (reference
    ProjectionNet.weighted_median, effdet/efficientdet.py:746-758).

    embds: [N, D]; confs: [N]. Returns ([1, D] median, conf_sum scalar).
    """
    conf_sum = jnp.sum(confs)
    order = jnp.argsort(embds, axis=0)                    # [N, D]
    sorted_elems = jnp.take_along_axis(embds, order, axis=0)
    sorted_confs = confs[order]                           # [N, D]
    cum = jnp.cumsum(sorted_confs, axis=0)
    median_idx = jnp.argmax(cum >= conf_sum / 2, axis=0)[None, :]
    median = jnp.take_along_axis(sorted_elems, median_idx, axis=0)
    if stop_gradient:
        median = jax.lax.stop_gradient(median)
    return median, conf_sum


def cosine_hinge_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                      margin: float = 0.0) -> jnp.ndarray:
    """Hinged cosine loss (reference cosine_loss, loss.py:97-101):
    positives pay 1-x, negatives pay max(x - margin, 0)."""
    mask = targets == 1.0
    loss = jnp.where(mask, 1.0 - inputs, inputs - margin)
    return jnp.mean(jnp.clip(loss, 0.0))


def projection_losses(
        result: ClusterResult,
        proj_labels: jnp.ndarray,      # [M] anchor GT labels (-1 = bg)
        task_cls: jnp.ndarray,         # scalar task category id
        soft_logits: jnp.ndarray,      # [M] pre-sigmoid gate logits
        loss_mode: str = "separate",
        sim_target: str = "max",
        margin: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase-A supervision (infer.py:448-494): cosine losses pulling
    same-task-class anchor pairs together + objectness BCE on the gate.

    Returns (embds_loss, clust_loss, obj_loss).
    """
    champs = result.champion_idx
    soft = result.soft_thresh

    champ_sims = result.champ_sims                              # [M, S]
    if sim_target == "max":
        all_max, all_arg = jnp.max(champ_sims, axis=1), jnp.argmax(champ_sims, axis=1)
        # pair_target[i, j] = 1 iff label_i == label_j == task_cls; only
        # champion columns are ever read, so index the [M, M] matrix
        # symbolically instead of forming it (5.3 GB at M = 37800)
        champ_labels = proj_labels[champs]                      # [S]
        champ_labels_target = jnp.where(
            champ_labels == task_cls, 1.0, -1.0)                # [S]
        nearest_champ_label = champ_labels[all_arg]             # [M]
        per_anchor_target = jnp.where(
            (proj_labels == nearest_champ_label) &
            (nearest_champ_label == task_cls), 1.0, -1.0)

        if loss_mode == "separate":
            clust_loss = cosine_hinge_loss(
                result.champion_target_clust, champ_labels_target, margin)
            embds_loss = cosine_hinge_loss(
                soft * all_max, per_anchor_target, margin)
        elif loss_mode == "same":
            clust_loss = jnp.float32(0.0)
            embds_loss = cosine_hinge_loss(
                soft * all_max * result.target_clust, per_anchor_target, margin)
        else:  # 'no_conf'
            clust_loss = cosine_hinge_loss(
                result.champion_target_clust, champ_labels_target, margin)
            embds_loss = cosine_hinge_loss(all_max, per_anchor_target, margin)
    else:  # 'avg'
        all_avg = jnp.mean(champ_sims, axis=1)
        anchor_target = jnp.where(proj_labels == task_cls, 1.0, -1.0)
        embds_loss = cosine_hinge_loss(soft * all_avg, anchor_target, margin)
        clust_loss = jnp.float32(0.0)

    obj_target = (proj_labels > -1).astype(jnp.float32)
    obj_bce = jnp.clip(soft_logits, 0) - soft_logits * obj_target + \
        jnp.log1p(jnp.exp(-jnp.abs(soft_logits)))
    obj_loss = jnp.sum(obj_bce)
    return embds_loss, clust_loss, obj_loss
