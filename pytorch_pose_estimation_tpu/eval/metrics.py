"""COCO mAP metrics with the reference's accumulate/reset/result surface.

Reference: utils/sbp_utils.py:121-189 (SBP), utils/spm_utils.py:282-351
(SPM), utils/sbp_pis_utils.py:9-47 (PIS).  TPU-native difference: the whole
eval batch is decoded in one jitted device call (decode_sbp_batch /
decode_spm) instead of a per-sample Python loop with a batch==1 assert;
only the results.json packing runs on host.

The packed results reproduce the reference bit-for-bit at decode level:
joints below the confidence threshold become (0, 0, 0) with conf 0,
visible joints get visibility flag 1, score = mean joint confidence, and
coordinates are mapped input-crop -> bbox frame -> original image.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..data.coco import CocoAnnotations
from ..ops.decode import decode_sbp_fast, decode_spm_batch
from .cocoeval import KeypointEvaluator


class SBPmAPCOCO:
    """Top-down SBP keypoint AP@OKS=.50 on COCO-format annotations."""

    def __init__(self, json_path: str, input_size, conf_threshold: float):
        self.coco = CocoAnnotations(json_path)
        self.input_size = list(input_size)  # [height, width]
        self.conf_threshold = float(conf_threshold)
        self.result_list = []

    def reset_states(self):
        self.result_list = []

    def _pack(self, joints: np.ndarray, img_id: int, cat_id: int,
              extra_zero_joints: int = 0):
        tmp_joints, tmp_confs = [], []
        for (x, y, conf) in joints:
            if conf < 0:
                tmp_joints.extend([0, 0, 0])
                tmp_confs.append(0.0)
                continue
            tmp_joints.extend([float(x), float(y), 1])
            tmp_confs.append(float(conf))
        tmp_joints.extend([0] * (3 * extra_zero_joints))
        self.result_list.append({
            "image_id": int(img_id),
            "category_id": int(cat_id),
            "keypoints": tmp_joints,
            "score": float(sum(tmp_confs) / joints.shape[0]),
        })

    _extra_zero_joints = 0

    def update_state(self, target: dict, y_pred, count: int = None) -> None:
        """target: dict with 'bbox' [B,4], 'image_id' [B], 'category_id' [B];
        y_pred: NHWC logits [B, H, W, K] (device array ok).
        ``count`` limits to the first N rows (masked padded-batch eval)."""
        joints = decode_sbp_fast(
            y_pred, int(self.input_size[1]), self.conf_threshold, True)
        self.update_state_decoded(target, joints, count)

    def update_state_decoded(self, target: dict, joints,
                             count: int = None) -> None:
        """Same, but with joints [B, K, 3] already decoded on device
        (input-size coords) -- the trainer's eval step uses this to keep
        device->host transfers tiny."""
        joints = np.asarray(joints)
        bbox = np.asarray(target["bbox"], np.float64)
        img_ids = np.asarray(target["image_id"])
        cat_ids = np.asarray(target["category_id"])
        in_h, in_w = self.input_size
        n = joints.shape[0] if count is None else min(count, joints.shape[0])
        for idx in range(n):
            j = joints[idx].astype(np.float64).copy()
            j[:, 0] = j[:, 0] * (bbox[idx][2] / in_w) + bbox[idx][0]
            j[:, 1] = j[:, 1] * (bbox[idx][3] / in_h) + bbox[idx][1]
            self._pack(j, img_ids[idx], cat_ids[idx],
                       extra_zero_joints=self._extra_zero_joints)

    def result(self, verbose: bool = True) -> float:
        results_json_path = os.path.join(os.getcwd(), "results.json")
        with open(results_json_path, "w") as f:
            json.dump(self.result_list, f, indent=4)
        if not self.result_list:
            return 0.0
        coco_dt = self.coco.load_results(self.result_list)
        evaluator = KeypointEvaluator(self.coco, coco_dt)
        stats = evaluator.run(verbose)
        return float(stats[1])


class SBPmAPPIS(SBPmAPCOCO):
    """11-keypoint PIS variant: pads 6 missing COCO keypoints with zeros so
    results score against the 17-keypoint OKS evaluator
    (reference: utils/sbp_pis_utils.py:40)."""

    _extra_zero_joints = 6


class SPMmAPCOCO:
    """Bottom-up SPM keypoint AP@OKS=.50: one result entry per decoded
    person, whole-image coordinate rescale."""

    def __init__(self, json_path: str, input_size: int, sigma: float,
                 conf_threshold: float, max_persons: int = 30):
        self.coco = CocoAnnotations(json_path)
        self.input_size = int(input_size)
        self.sigma = sigma
        self.conf_threshold = float(conf_threshold)
        self.max_persons = max_persons
        self.result_list = []

    def reset_states(self):
        self.result_list = []

    def update_state(self, target: dict, y_pred, count: int = None) -> None:
        """target: dict with 'image_size' [B,2] (w,h), 'image_id',
        'category_id'; y_pred: NHWC logits [B, H, W, 1+2K].  The whole
        batch decodes in one vmapped device call."""
        decoded = decode_spm_batch(
            y_pred, self.input_size, self.sigma, self.conf_threshold, True,
            self.max_persons)
        self.update_state_decoded(target, decoded, count)

    def update_state_decoded(self, target: dict, decoded,
                             count: int = None) -> None:
        """decoded: (roots [B,M,3], joints [B,M,K,3]) already decoded on
        device in input-size coords."""
        roots_b, kps_b = decoded
        roots_b = np.asarray(roots_b)
        kps_b = np.asarray(kps_b)
        image_sizes = np.asarray(target["image_size"], np.float64)
        img_ids = np.asarray(target["image_id"])
        cat_ids = np.asarray(target["category_id"])
        n = roots_b.shape[0] if count is None else min(count,
                                                       roots_b.shape[0])
        for idx in range(n):
            keep = roots_b[idx, :, 2] >= 0
            kps = kps_b[idx][keep].astype(np.float64).copy()
            kps[..., 0] *= image_sizes[idx][0] / self.input_size
            kps[..., 1] *= image_sizes[idx][1] / self.input_size
            for person in kps:
                tmp_joints, tmp_confs = [], []
                for (px, py, conf) in person:
                    if px == 0.0 and py == 0.0:
                        tmp_joints.extend([0, 0, 0])
                        tmp_confs.append(0.0)
                        continue
                    tmp_joints.extend([float(px), float(py), 1])
                    tmp_confs.append(float(conf))
                self.result_list.append({
                    "image_id": int(img_ids[idx]),
                    "category_id": int(cat_ids[idx]),
                    "keypoints": tmp_joints,
                    "score": float(sum(tmp_confs) / person.shape[0]),
                })

    def result(self, verbose: bool = True) -> float:
        if not self.result_list:
            return 0.0
        results_json_path = os.path.join(os.getcwd(), "results.json")
        with open(results_json_path, "w") as f:
            json.dump(self.result_list, f, indent=4)
        coco_dt = self.coco.load_results(self.result_list)
        evaluator = KeypointEvaluator(self.coco, coco_dt)
        stats = evaluator.run(verbose)
        return float(stats[1])
