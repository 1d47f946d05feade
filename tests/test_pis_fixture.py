"""PIS behavior-fixture geometry oracle: the generated GT joints must
classify 100% correctly under the harness classifiers BY CONSTRUCTION
(pis_handle_test_code.py HANDLE_ROI line test, pis_falling_down_test_code.py
NEG_MAX/POS_MIN gradient band) -- otherwise the recorded harness accuracy
(VERDICT r3 item 5) would measure fixture bugs, not the model."""

import json
import os

import numpy as np

from pytorch_pose_estimation_tpu.pis import FallingDown, HandleGrip

from synth_fixture import make_pis_behavior_dataset

NOSE, L_SHOULDER, R_SHOULDER, RIGHT_WRIST = 0, 5, 6, 10
HANDLE_ROI = ((1220, 1300), (1600, 1130))
NEG_MAX, POS_MIN = -1, 8


def _label(path, depth=-2):
    return os.path.normpath(path).split(os.sep)[depth]


def test_fixture_gt_is_classifier_consistent(tmp_path):
    train_json, handle_json, fall_json = make_pis_behavior_dataset(
        str(tmp_path), n_train=4, n_val_per_class=12, seed=3)

    handle = HandleGrip(HANDLE_ROI)
    with open(handle_json) as f:
        db = json.load(f)
    assert len(db["annotations"]) == 24
    by_img = {im["id"]: im for im in db["images"]}
    seen = set()
    for ann in db["annotations"]:
        kps = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        want = _label(by_img[ann["image_id"]]["file_name"]) == "grip"
        assert handle.get_handle_grip_result(kps[RIGHT_WRIST, :2]) == want
        seen.add(want)
    assert seen == {True, False}

    falling = FallingDown(NEG_MAX, POS_MIN)
    with open(fall_json) as f:
        db = json.load(f)
    by_img = {im["id"]: im for im in db["images"]}
    seen = set()
    for ann in db["annotations"]:
        kps = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        center = (kps[L_SHOULDER, :2] + kps[R_SHOULDER, :2]) / 2
        want = _label(by_img[ann["image_id"]]["file_name"]) == "normal"
        got = falling.get_falling_down_result(kps[NOSE, :2], center)
        assert got == want, (ann["image_id"], kps[NOSE], center)
        seen.add(want)
    assert seen == {True, False}

    # the train split loads through the PIS datamodule (absolute paths,
    # 11 keypoints, all records surviving sanitization)
    from pytorch_pose_estimation_tpu.data import SBPPISDataModule

    dm = SBPPISDataModule(
        train_path=train_json, val_path=handle_json,
        input_size=[256, 192], output_size=[64, 48], num_keypoints=11,
        sigma=2, workers=1, batch_size=4, class_labels=[])
    dm.setup()
    assert len(dm.train_db) == 4
    assert len(dm.val_db) == 24
    sample = dm.train_db[0]
    assert os.path.isabs(sample["image_path"])
    assert os.path.exists(sample["image_path"])
