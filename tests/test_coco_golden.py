"""CocoMeanAP pinned against COCOeval semantics (VERDICT r3 #8).

Two layers:
  * an analytic fixture whose COCOeval stats are derived by hand in the
    comments — crowd ignore (IoA denominator), area-range GT ignore,
    maxDets truncation, matched-ignored-GT consumption;
  * randomized parity against ``cocoeval_oracle.py``, a literal
    image-major transcription of pycocotools' evaluateImg + accumulate
    (see that module's provenance note), over crowd-heavy multi-class
    fixtures, on BOTH the native C++ matcher and the numpy fallback.

Reference behavior being pinned: effdet/evaluator.py:102-116 delegates to
pycocotools COCOeval(iouType='bbox') and reports stats[0].
"""
import numpy as np
import pytest

from cocoeval_oracle import cocoeval_stats
from ood_object_detection_tpu.evaluation import coco_eval as ce
from ood_object_detection_tpu.evaluation import native
from ood_object_detection_tpu.evaluation.coco_eval import CocoMeanAP


def _stats_via(images, num_classes, use_native, max_dets=100):
    if use_native and not native.available():
        pytest.skip("native eval core unavailable")
    ev = CocoMeanAP(num_classes=num_classes, max_dets=max_dets)
    for key, im in enumerate(images):
        ev.add_image(key,
                     np.asarray(im["det_boxes"], np.float32),
                     np.asarray(im["det_scores"], np.float32),
                     np.asarray(im["det_classes"], np.int32),
                     np.asarray(im["gt_boxes"], np.float32),
                     np.asarray(im["gt_classes"], np.int32),
                     np.asarray(im.get("gt_crowd",
                                       np.zeros(len(im["gt_classes"]),
                                                bool))))
    if use_native:
        return ev.stats()
    orig = native.available
    native.available = lambda: False
    try:
        return ev.stats()
    finally:
        native.available = orig


@pytest.mark.parametrize("use_native", [True, False],
                         ids=["native", "numpy"])
def test_analytic_crowd_and_area_fixture(use_native):
    """Hand-derived golden. One class, one image.

    GT: A = [0,0,20,20]   (area 400, small, real)
        B = [100,100,300,300] (area 40000, large, CROWD)
        C = [40,40,56,56] (area 256, small, real)
    Dets (score order):
        d1 0.9 [0,0,20,20]      -> IoU(A)=1.0: TP at every threshold
        d2 0.8 [120,120,160,160] -> inside crowd B; IoA = 1600/1600 = 1.0
                                    -> matched to ignored B => ignored
        d3 0.7 [140,140,180,180] -> also inside B. B is crowd, so it can
                                    re-match => ignored too (NOT an FP)
        d4 0.6 [400,400,420,420] -> matches nothing, in-range area => FP
    npig ('all') = 2 (A, C). C is never detected.

    AP('all') per threshold: precision-recall points: TP@rank1 (P=1, R=.5),
    then FPs only. 101-pt AP = mean over recall grid of envelope:
    P=1 for r in [0, .5] (51 points), 0 beyond -> AP = 51/101.
    map50 = map75 = map = 51/101.

    Area 'small' (npig = 2: A and C; crowd B is size-ignored anyway):
    d4 (area 400 = small... 400 < 1024 so d4 IS small-range).
    d2/d3 (1600, medium-sized dets) unmatched-in-range? They match crowd B
    (B ignored in every range) -> still ignored. d4 small-range unmatched
    -> FP. Same cumulative series as 'all' => map_small = 51/101.
    Area 'medium'/'large': npig = 0 -> reported as 0.0 (CocoMeanAP's
    convention for pycocotools' -1 'no valid entries' sentinel).
    """
    images = [dict(
        det_boxes=[[0, 0, 20, 20], [120, 120, 160, 160],
                   [140, 140, 180, 180], [400, 400, 420, 420]],
        det_scores=[0.9, 0.8, 0.7, 0.6],
        det_classes=[1, 1, 1, 1],
        gt_boxes=[[0, 0, 20, 20], [100, 100, 300, 300], [40, 40, 56, 56]],
        gt_classes=[1, 1, 1],
        gt_crowd=[False, True, False],
    )]
    got = _stats_via(images, num_classes=1, use_native=use_native)
    want = 51.0 / 101.0
    assert got["map"] == pytest.approx(want, abs=1e-9)
    assert got["map50"] == pytest.approx(want, abs=1e-9)
    assert got["map75"] == pytest.approx(want, abs=1e-9)
    assert got["map_small"] == pytest.approx(want, abs=1e-9)
    assert got["map_medium"] == 0.0
    assert got["map_large"] == 0.0
    # and the transcription oracle agrees with the hand derivation
    oracle = cocoeval_stats(images, num_classes=1)
    for k, v in got.items():
        assert oracle[k] == pytest.approx(v, abs=1e-9), k


@pytest.mark.parametrize("use_native", [True, False],
                         ids=["native", "numpy"])
def test_matched_ignored_gt_is_consumed(use_native):
    """A non-crowd ignored GT (out of area range) is CONSUMED by the first
    det that matches it; the second det overlapping it becomes a plain FP
    (COCOeval's gtm bookkeeping — the old 'any ignored overlap => ignore'
    shortcut got this wrong)."""
    # GT area 10000 (medium). In the 'small' range it is ignored.
    images = [dict(
        det_boxes=[[0, 0, 100, 100], [0, 0, 100, 100], [0, 0, 30, 30]],
        det_scores=[0.9, 0.8, 0.7],
        det_classes=[1, 1, 1],
        gt_boxes=[[0, 0, 100, 100], [200, 200, 230, 230]],
        gt_classes=[1, 1],
    )]
    got = _stats_via(images, num_classes=1, use_native=use_native)
    oracle = cocoeval_stats(images, num_classes=1)
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k
    # smalls: npig=1 (the 30x30 GT). d1 matches+consumes the ignored big
    # GT; d2 can't re-match it -> unmatched, area 10000 out of small range
    # -> ignored; d3 (900, small) matches nothing -> FP. AP_small = 0.
    assert got["map_small"] == 0.0


def _random_images(rng, n_images, n_classes, crowd_prob=0.3):
    images = []
    for _ in range(n_images):
        n_gt = int(rng.integers(0, 8))
        n_dt = int(rng.integers(0, 14))
        gxy = rng.uniform(0, 400, (n_gt, 2))
        gwh = rng.uniform(4, 180, (n_gt, 2))      # spans area ranges
        dxy = rng.uniform(0, 400, (n_dt, 2))
        dwh = rng.uniform(4, 180, (n_dt, 2))
        # half the dets are jittered copies of GTs: realistic overlap mass
        for i in range(min(n_dt, n_gt)):
            if rng.uniform() < 0.6:
                dxy[i] = gxy[i] + rng.normal(0, 6, 2)
                dwh[i] = gwh[i] * rng.uniform(0.75, 1.3, 2)
        images.append(dict(
            det_boxes=np.concatenate([dxy, dxy + dwh], 1),
            det_scores=rng.uniform(0.05, 1.0, n_dt),
            det_classes=rng.integers(1, n_classes + 1, n_dt),
            gt_boxes=np.concatenate([gxy, gxy + gwh], 1),
            gt_classes=rng.integers(1, n_classes + 1, n_gt),
            gt_crowd=rng.uniform(size=n_gt) < crowd_prob,
        ))
    return images


@pytest.mark.parametrize("use_native", [True, False],
                         ids=["native", "numpy"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_parity_vs_cocoeval_transcription(use_native, seed):
    """CocoMeanAP (class-major streaming, native or numpy matcher) ==
    the image-major COCOeval transcription, on crowd-heavy multi-class
    random fixtures, to 1e-9."""
    rng = np.random.default_rng(seed)
    images = _random_images(rng, n_images=6, n_classes=3)
    got = _stats_via(images, num_classes=3, use_native=use_native)
    oracle = cocoeval_stats(images, num_classes=3)
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (k, got[k], v)


@pytest.mark.parametrize("use_native", [True, False],
                         ids=["native", "numpy"])
def test_maxdets_truncation_per_image_class(use_native):
    """maxDets applies per (image, category): 3 dets on class 1 with
    max_dets=2 drops the lowest-scoring one even when class 2 has dets on
    the same image."""
    images = [dict(
        det_boxes=[[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50],
                   [60, 60, 70, 70]],
        det_scores=[0.9, 0.8, 0.7, 0.95],
        det_classes=[1, 1, 1, 2],
        gt_boxes=[[40, 40, 50, 50], [60, 60, 70, 70]],
        gt_classes=[1, 2],
    )]
    got = _stats_via(images, num_classes=2, use_native=use_native,
                     max_dets=2)
    oracle = cocoeval_stats(images, num_classes=2, max_det=2)
    for k, v in oracle.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k
    # class 1's only true match (0.7 on [40,40,50,50]) was truncated ->
    # AP(class1) = 0; class 2 is perfect -> AP = 1. map = 0.5.
    assert got["map"] == pytest.approx(0.5, abs=1e-9)
