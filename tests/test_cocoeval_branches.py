"""Branch-by-branch OKS evaluator hardening (targets
eval/cocoeval.py:106-132 matching rules): crowd re-matching, ignore
regions, area-range edges, maxDets truncation, multi-category isolation,
score-order sensitivity, and AP monotonicity invariants.  A divergence in
any of these silently corrupts every AP the framework reports (the
reference consumes pycocotools' semantics at utils/sbp_utils.py:171-189).
"""

import numpy as np
import pytest

from pytorch_pose_estimation_tpu.data.coco import CocoAnnotations
from pytorch_pose_estimation_tpu.eval.cocoeval import KeypointEvaluator

K = 17


def _kp(x, y, v=2):
    """All 17 keypoints stacked near (x, y) (spread avoids degenerate
    loadRes extent boxes)."""
    out = []
    for i in range(K):
        out.extend([float(x + (i % 4)), float(y + i // 4), v])
    return out


def _gt(ann_id, img_id, x, y, area=3000.0, iscrowd=0, ignore=0, cat=1,
        labeled=True):
    kp = _kp(x, y, 2 if labeled else 0)
    return {"id": ann_id, "image_id": img_id, "category_id": cat,
            "iscrowd": iscrowd, "ignore": ignore, "area": float(area),
            "bbox": [x - 10.0, y - 10.0, 20.0, 20.0], "keypoints": kp,
            "num_keypoints": K if labeled else 0}


def _dt(img_id, x, y, score, cat=1):
    return {"image_id": img_id, "category_id": cat, "score": float(score),
            "keypoints": _kp(x, y, 1)}


def _build(gts, n_imgs=1, cats=(1,)):
    c = CocoAnnotations()
    c._index({
        "images": [{"id": i + 1, "width": 640, "height": 480,
                    "file_name": f"{i + 1}.jpg"} for i in range(n_imgs)],
        "annotations": gts,
        "categories": [{"id": cid, "name": "person" if cid == 1 else
                        f"cat{cid}", "supercategory": "person"}
                       for cid in cats],
    })
    return c


def _stats(gts, dts, n_imgs=1, cats=(1,)):
    gt = _build(gts, n_imgs, cats)
    ev = KeypointEvaluator(gt, gt.load_results(dts))
    return ev.run(verbose=False)


# -------------------------------------------------------------------------
# crowd / ignore branches
# -------------------------------------------------------------------------

def test_crowd_gt_absorbs_extra_detections_without_fp():
    """Detections matching an iscrowd gt are ignored (not FPs), a crowd
    gt can be RE-matched by several detections, and AP over the remaining
    real gt stays perfect."""
    gts = [_gt(1, 1, 100, 100),                       # real person
           _gt(2, 1, 300, 300, iscrowd=1)]            # crowd region
    clean = [_dt(1, 100, 100, 0.9)]
    with_crowd_hits = clean + [_dt(1, 300, 300, 0.8),
                               _dt(1, 301, 300, 0.7)]  # both hit the crowd
    s_clean = _stats(gts, clean)
    s_crowd = _stats(gts, with_crowd_hits)
    assert s_clean[0] == pytest.approx(1.0)
    np.testing.assert_allclose(s_crowd, s_clean)


def test_ignore_flag_gt_neither_scores_nor_penalizes():
    """An ignore=1 gt contributes nothing to npig; detections matching it
    are ignored; detections missing it are not penalized either."""
    gts = [_gt(1, 1, 100, 100), _gt(2, 1, 300, 300, ignore=1)]
    base = _stats(gts, [_dt(1, 100, 100, 0.9)])
    extra = _stats(gts, [_dt(1, 100, 100, 0.9), _dt(1, 300, 300, 0.5)])
    assert base[0] == pytest.approx(1.0)
    np.testing.assert_allclose(extra, base)


def test_unlabeled_gt_is_ignored():
    """A gt with zero labeled keypoints is auto-ignored (pycocotools
    num_keypoints==0 rule): it neither demands recall nor turns its
    matching detection into a FP (box-distance fallback OKS)."""
    gts = [_gt(1, 1, 100, 100), _gt(2, 1, 300, 300, labeled=False)]
    s = _stats(gts, [_dt(1, 100, 100, 0.9), _dt(1, 300, 300, 0.8)])
    assert s[0] == pytest.approx(1.0)
    assert s[5] == pytest.approx(1.0)


def test_non_ignored_gt_preferred_over_ignored():
    """A detection overlapping both an ignored and a non-ignored gt must
    match the non-ignored one (and count as its TP)."""
    gts = [_gt(1, 1, 100, 100),
           _gt(2, 1, 102, 100, ignore=1, area=3000.0)]
    s = _stats(gts, [_dt(1, 101, 100, 0.9)])
    # matched to the REAL gt -> recall 1 at loose OKS thresholds
    assert s[6] == pytest.approx(1.0)  # AR @ OKS=.5


# -------------------------------------------------------------------------
# area ranges
# -------------------------------------------------------------------------

def test_area_range_partitions_medium_vs_large():
    """gt areas 50^2 (medium) and 150^2 (large): each AP column sees only
    its own gts; 'all' sees both."""
    gts = [_gt(1, 1, 100, 100, area=50.0 ** 2),
           _gt(2, 1, 300, 300, area=150.0 ** 2)]
    # only the medium gt is detected
    s = _stats(gts, [_dt(1, 100, 100, 0.9)])
    assert s[3] == pytest.approx(1.0)   # AP medium: its gt found
    assert s[4] == pytest.approx(0.0)   # AP large: its gt missed
    assert 0.0 < s[0] < 1.0             # AP all: one of two


def test_area_range_out_of_range_gt_not_required():
    """A tiny gt (area < 32^2) is out of range for medium/large: those
    columns must not demand it (npig excludes it) -- detecting only the
    in-range gt keeps AP(medium) at 1.0."""
    gts = [_gt(1, 1, 100, 100, area=50.0 ** 2),
           _gt(2, 1, 300, 300, area=10.0 ** 2)]
    s = _stats(gts, [_dt(1, 100, 100, 0.9)])
    assert s[3] == pytest.approx(1.0)


# -------------------------------------------------------------------------
# maxDets
# -------------------------------------------------------------------------

def test_maxdets_truncation_drops_low_scoring_match():
    """21+ detections in one image: only the top-20 by score survive; a
    perfect detection ranked 21st is truncated and recall collapses."""
    gts = [_gt(1, 1, 100, 100)]
    junk = [_dt(1, 500, 400, 0.9 - 0.01 * i) for i in range(20)]
    perfect_last = junk + [_dt(1, 100, 100, 0.05)]
    s = _stats(gts, perfect_last)
    assert s[5] == pytest.approx(0.0)   # AR: the true match never entered

    # same detections but the perfect one scores above the junk
    perfect_first = junk + [_dt(1, 100, 100, 0.95)]
    s2 = _stats(gts, perfect_first)
    assert s2[5] == pytest.approx(1.0)


# -------------------------------------------------------------------------
# score ordering / invariants
# -------------------------------------------------------------------------

def test_fp_above_tp_lowers_ap_fp_below_does_not():
    gts = [_gt(1, 1, 100, 100)]
    tp = _dt(1, 100, 100, 0.8)
    s_low_fp = _stats(gts, [tp, _dt(1, 500, 400, 0.3)])
    s_high_fp = _stats(gts, [tp, _dt(1, 500, 400, 0.95)])
    # 101-pt interpolated AP ignores a TRAILING fp entirely
    assert s_low_fp[1] == pytest.approx(1.0)
    # an fp ranked above the tp caps precision at 0.5 for every recall
    assert s_high_fp[1] == pytest.approx(0.5, abs=0.01)


def test_ap_monotone_under_added_tp():
    gts = [_gt(1, 1, 100, 100), _gt(2, 1, 300, 300)]
    one = _stats(gts, [_dt(1, 100, 100, 0.9)])
    two = _stats(gts, [_dt(1, 100, 100, 0.9), _dt(1, 300, 300, 0.8)])
    assert two[0] >= one[0]
    assert two[5] > one[5]
    assert two[0] == pytest.approx(1.0)


def test_duplicate_detections_on_one_gt_are_fps():
    """Second detection on an already-matched (non-crowd) gt cannot
    re-match it and becomes a FP."""
    gts = [_gt(1, 1, 100, 100)]
    s = _stats(gts, [_dt(1, 100, 100, 0.9), _dt(1, 100, 100, 0.8)])
    assert s[5] == pytest.approx(1.0)   # recall unaffected (single TP)
    # the duplicate is an (ignored-nothing) FP; as a TRAILING fp the
    # 101-pt interpolated AP stays exactly 1.0 -- and crucially the dup
    # must NOT re-match the gt and inflate TP counts
    assert s[1] == pytest.approx(1.0)


# -------------------------------------------------------------------------
# multi-category
# -------------------------------------------------------------------------

def test_categories_evaluated_independently():
    """A detection in category 2 can never match a category-1 gt; each
    category's AP is computed over its own gts then averaged."""
    gts = [_gt(1, 1, 100, 100, cat=1), _gt(2, 1, 300, 300, cat=2)]
    # cat-1 det correct; cat-2 det placed on the CAT-1 gt (wrong place)
    s = _stats(gts, [_dt(1, 100, 100, 0.9, cat=1),
                     _dt(1, 100, 100, 0.8, cat=2)], cats=(1, 2))
    # cat1 AP 1.0, cat2 AP 0.0 -> mean 0.5
    assert s[0] == pytest.approx(0.5, abs=0.01)

    s2 = _stats(gts, [_dt(1, 100, 100, 0.9, cat=1),
                      _dt(1, 300, 300, 0.8, cat=2)], cats=(1, 2))
    assert s2[0] == pytest.approx(1.0)


def test_empty_detections_all_columns_zero():
    gts = [_gt(1, 1, 100, 100)]
    s = _stats(gts, [])
    assert s[0] == pytest.approx(0.0)
    assert s[5] == pytest.approx(0.0)
