"""OKS evaluator tests: hand-computed OKS values, matching semantics, and
the reference's own sanity invariant (GT fed back as predictions scores
~perfect AP, reference: test_coco_keypoints_map.py:29-64)."""

import numpy as np
import pytest

from pytorch_pose_estimation_tpu.data.coco import COCO_KPT_SIGMAS, CocoAnnotations
from pytorch_pose_estimation_tpu.eval.cocoeval import KeypointEvaluator

from synth_fixture import make_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    json_path = make_dataset(str(out), "val2017", 12, seed=3)
    return json_path


def _gt_as_results(json_path, score=0.9, jitter=0.0, seed=0):
    coco = CocoAnnotations(json_path)
    rng = np.random.RandomState(seed)
    results = []
    for ann in coco.anns.values():
        kp = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3).copy()
        if jitter:
            kp[:, :2] += rng.uniform(-jitter, jitter, kp[:, :2].shape)
        out = []
        for (x, y, v) in kp:
            out.extend([float(x), float(y), 1])
        results.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "keypoints": out,
            "score": score,
        })
    return coco, results


def test_gt_as_prediction_perfect_ap(synth):
    coco, results = _gt_as_results(synth)
    ev = KeypointEvaluator(coco, coco.load_results(results))
    stats = ev.run(verbose=False)
    assert stats[0] == pytest.approx(1.0)   # AP @ 0.5:0.95
    assert stats[1] == pytest.approx(1.0)   # AP @ 0.5
    assert stats[5] == pytest.approx(1.0)   # AR


def test_small_jitter_keeps_ap50(synth):
    coco, results = _gt_as_results(synth, jitter=2.0, seed=1)
    ev = KeypointEvaluator(coco, coco.load_results(results))
    stats = ev.run(verbose=False)
    assert stats[1] > 0.95          # AP@.5 tolerant of 2px jitter
    assert stats[0] <= stats[1] + 1e-9


def test_large_jitter_destroys_ap(synth):
    coco, results = _gt_as_results(synth, jitter=150.0, seed=2)
    ev = KeypointEvaluator(coco, coco.load_results(results))
    stats = ev.run(verbose=False)
    assert stats[1] < 0.3


def test_missing_detections_lower_recall(synth):
    coco, results = _gt_as_results(synth)
    half = results[: len(results) // 2]
    ev = KeypointEvaluator(coco, coco.load_results(half))
    stats = ev.run(verbose=False)
    assert 0.2 < stats[5] < 0.8


def test_oks_value_hand_computed():
    """Single gt/dt pair with one labeled keypoint: OKS must equal
    exp(-d^2 / (2 * area * (2*sigma_nose)^2))."""
    gt = {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
          "area": 1000.0, "bbox": [0, 0, 50, 20],
          "keypoints": [10, 10, 2] + [0, 0, 0] * 16, "num_keypoints": 1}
    dx = 3.0
    dt_kp = [10 + dx, 10, 1] + [0, 0, 0] * 16
    gt_db = {"images": [{"id": 1, "file_name": "x", "width": 100,
                         "height": 100}],
             "annotations": [gt],
             "categories": [{"id": 1, "name": "person"}]}
    import json, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "gt.json")
        with open(p, "w") as f:
            json.dump(gt_db, f)
        coco = CocoAnnotations(p)
    dt = coco.load_results([{"image_id": 1, "category_id": 1,
                             "keypoints": dt_kp, "score": 0.9}])
    ev = KeypointEvaluator(coco, dt)
    ious = ev._oks(list(dt.anns.values()), [coco.anns[1]])
    var = (2 * COCO_KPT_SIGMAS[0]) ** 2
    want = np.exp(-(dx ** 2) / var / (1000.0 + np.spacing(1)) / 2)
    np.testing.assert_allclose(ious[0, 0], want, rtol=1e-12)


def test_matching_prefers_higher_score():
    """Two detections on one gt: high-score one is TP, other is FP ->
    AP@.5 = 0.5 precision envelope effect (AP stays 1.0 at recall 1 with
    101-pt interpolation when the TP ranks first)."""
    import json, tempfile, os
    gt = {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
          "area": 1000.0, "bbox": [0, 0, 50, 20],
          "keypoints": [10, 10, 2] + [0, 0, 0] * 16, "num_keypoints": 1}
    gt_db = {"images": [{"id": 1, "file_name": "x", "width": 100,
                         "height": 100}],
             "annotations": [gt],
             "categories": [{"id": 1, "name": "person"}]}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "gt.json")
        with open(p, "w") as f:
            json.dump(gt_db, f)
        coco = CocoAnnotations(p)
    res = [
        {"image_id": 1, "category_id": 1,
         "keypoints": [10, 10, 1] + [0, 0, 0] * 16, "score": 0.9},
        {"image_id": 1, "category_id": 1,
         "keypoints": [10.5, 10, 1] + [0, 0, 0] * 16, "score": 0.5},
    ]
    ev = KeypointEvaluator(coco, coco.load_results(res))
    stats = ev.run(verbose=False)
    # perfect detection ranked first: precision at every recall thr is 1
    assert stats[1] == pytest.approx(1.0)


def test_sbp_db_sanitization(synth):
    from pytorch_pose_estimation_tpu.data import load_sbp_instance_db

    coco = CocoAnnotations(synth)
    db = load_sbp_instance_db(coco, "imgdir", 17)
    assert len(db) == len(coco.anns)  # all synth persons are valid
    rec = db[0]
    assert set(rec) >= {"image_path", "bbox", "joints", "joints_vis",
                        "image_id", "category_id"}
    assert rec["joints"].shape == (17, 2)
    # joints strictly inside bbox or zeroed
    x1, y1, w, h = rec["bbox"]
    vis = rec["joints_vis"] > 0
    assert (rec["joints"][vis, 0] > int(x1)).all()
    assert (rec["joints"][vis, 0] < int(x1) + int(w)).all()
    assert (rec["joints"][vis, 1] > int(y1)).all()
    assert (rec["joints"][vis, 1] < int(y1) + int(h)).all()


def test_spm_db(synth):
    from pytorch_pose_estimation_tpu.data import load_spm_image_db

    coco = CocoAnnotations(synth)
    db = load_spm_image_db(coco, "imgdir", 17)
    assert len(db) == len(coco.imgs)
    rec = db[0]
    assert rec["joints"].shape[1:] == (17, 2)
    assert rec["centers"].shape[0] == rec["joints"].shape[0]
    assert rec["image_size"] == (400, 320)
