"""A literal numpy transcription of pycocotools' COCOeval (bbox, useCats=1)
used as a test oracle for evaluation/coco_eval.py.

Provenance: pycocotools is not installable in this environment, so the
golden cannot come from running the real COCOeval. Instead this module
re-implements the published algorithm (cocoeval.py evaluateImg +
accumulate + summarize) step by step, in pycocotools' own structure —
image-major evaluateImg products, then a global accumulate — which is an
independent code path from CocoMeanAP's class-major streaming design.
Semantics covered:

  * crowd GT overlap = intersection / detection area (maskUtils.iou with
    iscrowd=1), and crowd GTs are matchable by multiple detections;
  * GTs scanned ignored-last; a det already matched to a real GT stops at
    the first ignored GT; equal-IoU ties go to the later GT;
  * a det matched to an ignored GT is itself ignored (not an FP);
  * unmatched dets with out-of-area-range area are ignored;
  * maxDets truncation per (image, category);
  * area-range GT ignore = iscrowd | area outside [lo, hi);
  * 101-point interpolated precision via searchsorted(side='left'),
    out-of-range recall points -> 0;
  * classes with no non-ignored GT are excluded (-1) from the means.
"""
import numpy as np

IOU_THRS = np.arange(0.5, 1.0, 0.05).astype(np.float32)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _bbox_overlaps(dt, gt, iscrowd):
    """maskUtils.iou for xyxy boxes: IoU, except crowd columns use
    intersection / det-area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    out = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        da = max(0.0, (d[2] - d[0])) * max(0.0, (d[3] - d[1]))
        for j, g in enumerate(gt):
            iw = min(d[2], g[2]) - max(d[0], g[0])
            ih = min(d[3], g[3]) - max(d[1], g[1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            if iscrowd[j]:
                denom = da
            else:
                ga = (g[2] - g[0]) * (g[3] - g[1])
                denom = da + ga - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_crowd, area_rng,
                  max_det):
    """COCOeval.evaluateImg for one (image, category, areaRng, maxDet).

    Returns None when there is nothing, else a dict with dtMatches,
    dtIgnore [T, D], dtScores [D], num non-ignored gt."""
    if len(gt_boxes) == 0 and len(dt_boxes) == 0:
        return None
    lo, hi = area_rng
    g_area = np.array([(g[2] - g[0]) * (g[3] - g[1]) for g in gt_boxes])
    gt_ig = np.array([bool(c) or a < lo or a > hi
                      for c, a in zip(gt_crowd, g_area)], bool) \
        if len(gt_boxes) else np.zeros(0, bool)
    # sort gt ignored-last, dt by score descending (both mergesort-stable)
    gtind = np.argsort(gt_ig, kind="mergesort")
    gt = np.asarray(gt_boxes, float)[gtind] if len(gt_boxes) else \
        np.zeros((0, 4))
    gt_ig = gt_ig[gtind]
    crowd = np.asarray(gt_crowd, bool)[gtind] if len(gt_boxes) else \
        np.zeros(0, bool)
    dtind = np.argsort(-np.asarray(dt_scores), kind="mergesort")[:max_det]
    dt = np.asarray(dt_boxes, float)[dtind] if len(dt_boxes) else \
        np.zeros((0, 4))
    scores = np.asarray(dt_scores, float)[dtind]

    ious = _bbox_overlaps(dt, gt, crowd)
    T, D, G = len(IOU_THRS), len(dt), len(gt)
    dtm = np.zeros((T, D))
    gtm = np.zeros((T, G))
    dt_ig = np.zeros((T, D), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(float(t), 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not crowd[gind]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = 1 + m
            gtm[tind, m] = 1 + dind
    # unmatched dets out of area range are ignored
    d_area = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1]) if D else \
        np.zeros(0)
    a = (d_area < lo) | (d_area > hi)
    dt_ig = dt_ig | ((dtm == 0) & a[None, :])
    return dict(dtMatches=dtm, dtIgnore=dt_ig, dtScores=scores,
                npig=int((~gt_ig).sum()))


def cocoeval_stats(images, num_classes, max_det=100):
    """COCOeval.accumulate + summarize over a list of images.

    ``images``: list of dicts with keys det_boxes, det_scores, det_classes,
    gt_boxes, gt_classes, gt_crowd (classes 1-based, boxes xyxy).
    Returns the CocoMeanAP.stats() key set.
    """
    T, R = len(IOU_THRS), len(REC_THRS)
    out = {}
    per_area_map = {}
    for area_name, area_rng in AREA_RNGS.items():
        # precision[t, r, k] like COCOeval's [T, R, K, A, M] at one (A, M)
        precision = -np.ones((T, R, num_classes))
        for k in range(num_classes):
            E = [_evaluate_img(
                    np.asarray(im["det_boxes"])[
                        np.asarray(im["det_classes"]) == k + 1],
                    np.asarray(im["det_scores"])[
                        np.asarray(im["det_classes"]) == k + 1],
                    np.asarray(im["gt_boxes"])[
                        np.asarray(im["gt_classes"]) == k + 1],
                    np.asarray(im.get("gt_crowd",
                                      np.zeros(len(im["gt_classes"]), bool)))
                    [np.asarray(im["gt_classes"]) == k + 1],
                    area_rng, max_det)
                 for im in images]
            E = [e for e in E if e is not None]
            if not E:
                continue
            scores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E], 1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in E], 1)[:, inds]
            npig = sum(e["npig"] for e in E)
            if npig == 0:
                continue
            tps = (dtm > 0) & ~dt_ig
            fps = (dtm == 0) & ~dt_ig
            tp_sum = np.cumsum(tps, 1).astype(float)
            fp_sum = np.cumsum(fps, 1).astype(float)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros(R)
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds_r = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds_r):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[t, :, k] = q
        def _mean(s):
            v = s[s > -1]
            return float(np.mean(v)) if len(v) else 0.0
        per_area_map[area_name] = _mean(precision)
        if area_name == "all":
            out["map"] = _mean(precision)
            out["map50"] = _mean(precision[0])
            out["map75"] = _mean(precision[5])
    out["map_small"] = per_area_map["small"]
    out["map_medium"] = per_area_map["medium"]
    out["map_large"] = per_area_map["large"]
    return out
