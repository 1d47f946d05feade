"""Visualization drawing tests (limb tables, sentinel handling)."""

import numpy as np

from pytorch_pose_estimation_tpu.vis import (
    get_coco_tagged_img_sbp,
    get_pis_tagged_img_sbp,
    get_tagged_img_spm,
)


def _blank():
    return np.zeros((100, 100, 3), np.uint8)


def test_coco_skeleton_draws():
    joints = np.zeros((17, 3), np.float32)
    # place all joints on a diagonal, all confident
    for i in range(17):
        joints[i] = (10 + 4 * i, 10 + 4 * i, 0.9)
    out = get_coco_tagged_img_sbp(_blank(), joints)
    assert out.shape == (100, 100, 3)
    assert out.sum() > 0
    # input not mutated
    assert _blank().sum() == 0


def test_coco_sentinels_skipped():
    joints = np.full((17, 3), -1.0, np.float32)
    out = get_coco_tagged_img_sbp(_blank(), joints)
    assert out.sum() == 0  # nothing drawn for conf < 0


def test_pis_11_keypoints():
    joints = np.zeros((11, 3), np.float32)
    for i in range(11):
        joints[i] = (20 + 5 * i, 30, 0.8)
    out = get_pis_tagged_img_sbp(_blank(), joints)
    assert out.sum() > 0


def test_spm_roots_and_keypoints():
    roots = np.array([[50, 50], [20, 80]], np.float32)
    kps = np.array([[[40, 40], [0, 0], [60, 60]],
                    [[10, 70], [30, 90], [0, 0]]], np.float32)
    out = get_tagged_img_spm(_blank(), roots, kps)
    assert out.sum() > 0
    # (0,0) joints skipped: nothing drawn near origin
    assert out[:6, :6].sum() == 0
