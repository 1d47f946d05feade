"""Metric-pipeline sanity check: feed ground-truth annotations back through
the results-JSON + OKS evaluation path as if they were predictions and
print all 10 stats -- the AP ceiling should be ~1.0
(reference: test_coco_keypoints_map.py:13-72).

    python test_coco_keypoints_map.py --cfg configs/sbp_coco.yaml
"""

import argparse

import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import CocoAnnotations
from pytorch_pose_estimation_tpu.eval import KeypointEvaluator


def main(cfg):
    coco = CocoAnnotations(cfg["val_path"])
    results = []
    for ann in coco.anns.values():
        kp = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
        out = []
        for (x, y, v) in kp:
            out.extend([float(x), float(y), 1 if v > 0 else 0])
        results.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "keypoints": out,
            "score": 0.9,
        })
    evaluator = KeypointEvaluator(coco, coco.load_results(results))
    stats = evaluator.run(verbose=True)
    print(f"\nAP@OKS=.50 (stats[1]) = {stats[1]:.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    args = parser.parse_args()
    main(get_configs(args.cfg))
