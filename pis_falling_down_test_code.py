"""Falling-down task accuracy harness: confusion matrix over a PIS val set
whose image paths carry the directory label ('normal' = positive class),
plus the observed nose-shoulder gradient band
(reference: pis_falling_down_test_code.py:63-153).

    python pis_falling_down_test_code.py --cfg configs/sbp_pis.yaml \
        --ckpt CKPT [--label-depth -5]
"""

import argparse
import os

import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPPISDataModule
from pytorch_pose_estimation_tpu.train.trainer import load_sbp_predictor

NOSE, L_SHOULDER, R_SHOULDER = 0, 5, 6
NEG_MAX = -1
POS_MIN = 8


def run(cfg, ckpt, label_depth=-5):
    data_module = SBPPISDataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        input_size=cfg["input_size"], output_size=cfg["output_size"],
        num_keypoints=cfg["num_keypoints"], sigma=cfg["sigma"],
        workers=cfg["workers"], batch_size=cfg["batch_size"],
        class_labels=cfg["class_labels"])
    data_module.prepare_data()
    data_module.setup()

    # fused uint8->joints predictor: ONE jitted dispatch per batch
    predict = load_sbp_predictor(cfg, ckpt)
    in_h, in_w = cfg["input_size"]

    import jax.numpy as jnp

    tp = tn = fp = fn = 0
    normal_gradient, fall_gradient = [], []
    sample_idx = 0
    for batch in data_module.val_loader():
        joints = np.asarray(predict(jnp.asarray(batch["image"])))
        for b in range(joints.shape[0]):
            rec = data_module.val_db[sample_idx]
            sample_idx += 1
            bbox = batch["bbox"][b]
            j = joints[b].astype(np.float64)
            j[:, 0] = j[:, 0] * (bbox[2] / in_w) + bbox[0]
            j[:, 1] = j[:, 1] * (bbox[3] / in_h) + bbox[1]

            is_normal_gt = rec["image_path"].split(os.sep)[label_depth] == \
                "normal"
            nose, ls, rs = j[NOSE], j[L_SHOULDER], j[R_SHOULDER]
            if nose[-1] < 0 or ls[-1] < 0 or rs[-1] < 0:
                # no detection counts against whichever class it belongs to
                if is_normal_gt:
                    fn += 1
                else:
                    fp += 1
                continue
            center = (ls[:2] + rs[:2]) / 2
            gradient = (nose[1] - center[1]) / (nose[0] - center[0] + 1e-6)
            upright = gradient < NEG_MAX or POS_MIN < gradient
            if is_normal_gt:
                normal_gradient.append(gradient)
                tp += upright
                fn += not upright
            else:
                fall_gradient.append(gradient)
                fp += upright
                tn += not upright

    normal_gradient = np.asarray(normal_gradient)
    neg = normal_gradient[normal_gradient < 0]
    pos = normal_gradient[normal_gradient > 0]
    if neg.size and pos.size:
        print(f"neg_max: {neg.max()}, pos_min: {pos.min()}")
    total = tp + tn + fp + fn
    print(f"total: {total}, TP: {tp}, TN: {tn}, FP: {fp}, FN: {fn}")
    print(f"Accuracy: {((tp + tn) / max(total, 1) * 100):.2f}%")
    return tp, tn, fp, fn


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    parser.add_argument("--ckpt", required=True, type=str)
    parser.add_argument("--label-depth", type=int, default=-5)
    parser.add_argument("--val-path", type=str, default=None,
                        help="override cfg val_path (labeled fixture)")
    args = parser.parse_args()
    cfg = get_configs(args.cfg)
    if args.val_path:
        cfg["val_path"] = args.val_path
    run(cfg, args.ckpt, args.label_depth)
