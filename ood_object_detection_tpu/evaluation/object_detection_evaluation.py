"""Core per-class detection evaluation accumulators (numpy, host).

From-scratch equivalent of the reference TF-models port
(effdet/evaluation/object_detection_evaluation.py:9-273 and
per_image_evaluation.py:5-538): greedy IoU matching of detections to GT per
image/class (difficult boxes ignored, one GT matches at most once), per-class
PR curves -> AP, and CorLoc. Group-of handling is reduced to the ignore
semantics the detection path actually exercises.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .metrics import (
    compute_average_precision,
    compute_cor_loc,
    compute_precision_recall,
)


def _iou_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU of yxyx boxes, [N, M]."""
    if boxes1.size == 0 or boxes2.size == 0:
        return np.zeros((boxes1.shape[0], boxes2.shape[0]), np.float64)
    ymin1, xmin1, ymax1, xmax1 = np.split(boxes1, 4, axis=1)
    ymin2, xmin2, ymax2, xmax2 = np.split(boxes2, 4, axis=1)
    ih = np.clip(np.minimum(ymax1, ymax2.T) - np.maximum(ymin1, ymin2.T), 0, None)
    iw = np.clip(np.minimum(xmax1, xmax2.T) - np.maximum(xmin1, xmin2.T), 0, None)
    inter = ih * iw
    a1 = (ymax1 - ymin1) * (xmax1 - xmin1)
    a2 = (ymax2 - ymin2) * (xmax2 - xmin2)
    union = a1 + a2.T - inter
    return np.where(inter == 0, 0.0, inter / np.maximum(union, 1e-12))


class PerImageEvaluation:
    """Per-image TP/FP labeling (reference per_image_evaluation.py:5-538)."""

    def __init__(self, num_classes: int, matching_iou_threshold: float = 0.5):
        self.num_classes = num_classes
        self.iou_threshold = matching_iou_threshold

    def compute_tp_fp(self, det_boxes, det_scores, det_classes,
                      gt_boxes, gt_classes, gt_difficult=None):
        """Returns (scores per class, tp/fp labels per class,
        is_class_correctly_detected [num_classes])."""
        if gt_difficult is None:
            gt_difficult = np.zeros(len(gt_classes), bool)
        scores_out: List[np.ndarray] = []
        labels_out: List[np.ndarray] = []
        correctly_detected = np.zeros(self.num_classes, dtype=int)

        for c in range(self.num_classes):
            d_mask = det_classes == c
            g_mask = gt_classes == c
            d_boxes = det_boxes[d_mask]
            d_scores = det_scores[d_mask]
            g_boxes = gt_boxes[g_mask]
            g_diff = gt_difficult[g_mask]

            order = np.argsort(-d_scores, kind="stable")
            d_boxes = d_boxes[order]
            d_scores = d_scores[order]

            n_det = len(d_scores)
            tp_fp = np.zeros(n_det, dtype=float)
            keep = np.ones(n_det, dtype=bool)

            if n_det and len(g_boxes):
                iou = _iou_matrix(d_boxes, g_boxes)
                matched = np.zeros(len(g_boxes), dtype=bool)
                for i in range(n_det):
                    j = int(np.argmax(iou[i]))
                    if iou[i, j] >= self.iou_threshold:
                        if g_diff[j]:
                            keep[i] = False      # matched difficult: ignored
                        elif not matched[j]:
                            matched[j] = True
                            tp_fp[i] = 1.0
            scores_out.append(d_scores[keep])
            labels_out.append(tp_fp[keep])

            # CorLoc: top-scoring detection of class c localizes some GT
            if len(g_boxes[~g_diff]) and n_det:
                iou_top = _iou_matrix(d_boxes[:1], g_boxes[~g_diff])
                if iou_top.size and iou_top.max() >= self.iou_threshold:
                    correctly_detected[c] = 1
        return scores_out, labels_out, correctly_detected


class ObjectDetectionEvaluation:
    """Cross-image accumulators -> AP/mAP/CorLoc (reference
    object_detection_evaluation.py:9-273)."""

    def __init__(self, num_gt_classes: int, matching_iou_threshold: float = 0.5,
                 label_id_offset: int = 0):
        self.num_classes = num_gt_classes
        self.label_id_offset = label_id_offset
        self.per_image = PerImageEvaluation(num_gt_classes,
                                            matching_iou_threshold)
        self.scores_per_class: List[List[np.ndarray]] = [
            [] for _ in range(num_gt_classes)]
        self.tp_fp_per_class: List[List[np.ndarray]] = [
            [] for _ in range(num_gt_classes)]
        self.num_gt_instances_per_class = np.zeros(num_gt_classes, int)
        self.num_gt_imgs_per_class = np.zeros(num_gt_classes, int)
        self.num_images_correctly_detected_per_class = np.zeros(
            num_gt_classes, int)
        self._gt: Dict = {}

    def add_single_ground_truth_image_info(
            self, image_key, gt_boxes: np.ndarray, gt_class_labels: np.ndarray,
            gt_is_difficult: Optional[np.ndarray] = None):
        if image_key in self._gt:
            return
        gt_class_labels = gt_class_labels - self.label_id_offset
        if gt_is_difficult is None:
            gt_is_difficult = np.zeros(len(gt_class_labels), bool)
        self._gt[image_key] = (gt_boxes, gt_class_labels, gt_is_difficult)
        for c in range(self.num_classes):
            mask = (gt_class_labels == c) & ~gt_is_difficult
            self.num_gt_instances_per_class[c] += int(mask.sum())
            if (gt_class_labels == c).any():
                self.num_gt_imgs_per_class[c] += 1

    def add_single_detected_image_info(
            self, image_key, det_boxes: np.ndarray, det_scores: np.ndarray,
            det_class_labels: np.ndarray):
        det_class_labels = det_class_labels - self.label_id_offset
        gt_boxes, gt_classes, gt_diff = self._gt.get(
            image_key,
            (np.zeros((0, 4), np.float32), np.zeros(0, int), np.zeros(0, bool)))
        scores, tp_fp, correctly = self.per_image.compute_tp_fp(
            det_boxes, det_scores, det_class_labels,
            gt_boxes, gt_classes, gt_diff)
        for c in range(self.num_classes):
            if len(scores[c]):
                self.scores_per_class[c].append(scores[c])
                self.tp_fp_per_class[c].append(tp_fp[c])
        self.num_images_correctly_detected_per_class += correctly

    def evaluate(self, class_subset: Optional[np.ndarray] = None) -> Dict:
        """AP per class + mAP + CorLoc; optionally restricted to a subset of
        (0-based) class indices — the per-episode filter capability
        (reference detection_evaluator.py:268-305)."""
        per_class_ap = np.zeros(self.num_classes)
        valid = self.num_gt_instances_per_class > 0
        for c in range(self.num_classes):
            if not valid[c]:
                continue
            if self.scores_per_class[c]:
                scores = np.concatenate(self.scores_per_class[c])
                tp_fp = np.concatenate(self.tp_fp_per_class[c])
            else:
                scores = np.array([], np.float64)
                tp_fp = np.array([], np.float64)
            precision, recall = compute_precision_recall(
                scores, tp_fp, int(self.num_gt_instances_per_class[c]))
            per_class_ap[c] = compute_average_precision(precision, recall)

        per_class_corloc = compute_cor_loc(
            self.num_gt_imgs_per_class,
            self.num_images_correctly_detected_per_class)

        if class_subset is not None:
            sel = np.zeros(self.num_classes, bool)
            sel[np.asarray(class_subset, int)] = True
            valid = valid & sel
            corloc_valid = (self.num_gt_imgs_per_class > 0) & sel
        else:
            corloc_valid = self.num_gt_imgs_per_class > 0

        mean_ap = float(per_class_ap[valid].mean()) if valid.any() else 0.0
        corlocs = per_class_corloc[corloc_valid]
        mean_corloc = float(np.nanmean(corlocs)) if corlocs.size else 0.0
        return dict(
            per_class_ap=per_class_ap,
            mean_ap=mean_ap,
            per_class_corloc=per_class_corloc,
            mean_corloc=mean_corloc,
        )
