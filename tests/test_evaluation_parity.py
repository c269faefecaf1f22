"""Parity of the evaluation core vs the reference TF-models numpy port.

The reference evaluation package is torch-free (effdet/evaluation/*), so it
runs directly as the oracle. Randomized scenarios cover plain matching,
difficult boxes, group-of (ignored and weighted), weighted mean AP, and
recall operating bounds.
"""
import numpy as np
import pytest

from ood_object_detection_tpu.evaluation.object_detection_evaluation import (
    ObjectDetectionEvaluation,
)


def _random_scenario(rng, num_images=8, num_classes=4, max_gt=6, max_det=10,
                     p_difficult=0.0, p_group_of=0.0):
    """Per image: (gt_boxes, gt_classes, difficult, group_of,
    det_boxes, det_scores, det_classes), classes 0-based, boxes yxyx."""
    scenes = []
    for _ in range(num_images):
        ng = int(rng.integers(1, max_gt + 1))
        ymin = rng.uniform(0, 80, ng)
        xmin = rng.uniform(0, 80, ng)
        gt = np.stack([ymin, xmin, ymin + rng.uniform(5, 40, ng),
                       xmin + rng.uniform(5, 40, ng)], axis=1)
        gt_cls = rng.integers(0, num_classes, ng)
        diff = rng.uniform(size=ng) < p_difficult
        group = (rng.uniform(size=ng) < p_group_of) & ~diff

        nd = int(rng.integers(0, max_det + 1))
        if nd:
            # half the detections jitter GT boxes, half are random
            base = gt[rng.integers(0, ng, nd)]
            jitter = rng.normal(0, 6, (nd, 4))
            det = np.where(rng.uniform(size=(nd, 1)) < 0.5,
                           base + jitter,
                           np.stack([rng.uniform(0, 80, nd),
                                     rng.uniform(0, 80, nd),
                                     rng.uniform(20, 120, nd),
                                     rng.uniform(20, 120, nd)], axis=1))
            det[:, 2] = np.maximum(det[:, 2], det[:, 0] + 1)
            det[:, 3] = np.maximum(det[:, 3], det[:, 1] + 1)
            scores = rng.uniform(0.05, 1.0, nd)
            det_cls = rng.integers(0, num_classes, nd)
        else:
            det = np.zeros((0, 4))
            scores = np.zeros(0)
            det_cls = np.zeros(0, int)
        scenes.append((gt.astype(np.float32), gt_cls.astype(int),
                       diff, group, det.astype(np.float32),
                       scores.astype(np.float32), det_cls.astype(int)))
    return scenes


@pytest.fixture(autouse=True)
def _numpy_legacy_aliases():
    """The reference (written for numpy<1.24) uses np.float / np.bool."""
    had_float = hasattr(np, "float")
    had_bool = hasattr(np, "bool")
    if not had_float:
        np.float = float
    if not had_bool:
        np.bool = bool
    yield
    if not had_float:
        del np.float
    if not had_bool:
        del np.bool


def _run_pair(scenes, num_classes, reference_path, **kwargs):
    ref_mod = pytest.importorskip(
        "effdet.evaluation.object_detection_evaluation")
    ours = ObjectDetectionEvaluation(num_classes, **kwargs)
    ref = ref_mod.ObjectDetectionEvaluation(num_classes, **kwargs)
    for key, (gt, gt_cls, diff, group, det, scores, det_cls) in \
            enumerate(scenes):
        ours.add_single_ground_truth_image_info(
            key, gt, gt_cls, gt_is_difficult=diff, gt_is_group_of=group)
        ref.add_single_ground_truth_image_info(
            key, gt, gt_cls, gt_is_difficult_list=diff,
            gt_is_group_of_list=group)
        ours.add_single_detected_image_info(key, det, scores, det_cls)
        ref.add_single_detected_image_info(key, det, scores, det_cls)
    return ours.evaluate(), ref.evaluate()


def _assert_ap_match(res, ref_res):
    ref_ap = np.nan_to_num(np.asarray(ref_res["per_class_ap"], float))
    np.testing.assert_allclose(res["per_class_ap"], ref_ap, atol=1e-9)
    np.testing.assert_allclose(res["mean_ap"], float(ref_res["mean_ap"]),
                               atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_plain(seed, reference_path):
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng)
    res, ref = _run_pair(scenes, 4, reference_path)
    _assert_ap_match(res, ref)
    np.testing.assert_allclose(
        res["mean_corloc"], float(ref["mean_corloc"]), atol=1e-9)


@pytest.mark.parametrize("seed", [3, 4])
def test_parity_difficult(seed, reference_path):
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng, p_difficult=0.4)
    res, ref = _run_pair(scenes, 4, reference_path)
    _assert_ap_match(res, ref)


@pytest.mark.parametrize("seed", [5, 6])
def test_parity_group_of_ignored(seed, reference_path):
    """OpenImages protocol, group_of_weight=0: matches ignored."""
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng, p_group_of=0.5)
    res, ref = _run_pair(scenes, 4, reference_path, group_of_weight=0.0)
    _assert_ap_match(res, ref)


@pytest.mark.parametrize("seed", [7, 8])
def test_parity_group_of_weighted(seed, reference_path):
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng, p_group_of=0.5)
    res, ref = _run_pair(scenes, 4, reference_path, group_of_weight=0.3)
    _assert_ap_match(res, ref)


@pytest.mark.parametrize("seed", [9, 10])
def test_parity_weighted_mean_ap(seed, reference_path):
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng)
    res, ref = _run_pair(scenes, 4, reference_path,
                         use_weighted_mean_ap=True)
    np.testing.assert_allclose(res["mean_ap"], float(ref["mean_ap"]),
                               atol=1e-9)


@pytest.mark.parametrize("seed", [11])
def test_parity_recall_bounds(seed, reference_path):
    rng = np.random.default_rng(seed)
    scenes = _random_scenario(rng, num_images=12)
    res, ref = _run_pair(scenes, 4, reference_path,
                         recall_lower_bound=0.2, recall_upper_bound=0.8)
    _assert_ap_match(res, ref)
