"""Handle-grip task accuracy harness: confusion matrix over a PIS val set
whose image paths carry the directory label ('grip' = positive)
(reference: pis_handle_test_code.py:69-128, label at path component -5).

TPU-native difference: inference runs in full batches with the batched
decode kernel instead of batch==1 loops.

    python pis_handle_test_code.py --cfg configs/sbp_pis.yaml --ckpt CKPT \
        [--label-depth -5]
"""

import argparse
import os

import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPPISDataModule
from pytorch_pose_estimation_tpu.pis import HandleGrip
from pytorch_pose_estimation_tpu.train.trainer import load_sbp_predictor

HANDLE_ROI = ((1220, 1300), (1600, 1130))
RIGHT_WRIST = 10


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
    handle_cls = HandleGrip(HANDLE_ROI)
    in_h, in_w = cfg["input_size"]

    import jax.numpy as jnp

    tp = tn = fp = fn = 0
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

            wrist = j[RIGHT_WRIST]
            is_grip_gt = rec["image_path"].split(os.sep)[label_depth] == "grip"
            if wrist[-1] < 0:
                grip_pred = False
            else:
                grip_pred = handle_cls.get_handle_grip_result(wrist[:2])
            if is_grip_gt:
                tp += grip_pred
                fn += not grip_pred
            else:
                tn += not grip_pred
                fp += grip_pred

    total = tp + tn + fp + fn
    print(f"total: {total}, TP: {tp}, TN: {tn}, FP: {fp}, FN: {fn}")
    print(f"Accuracy: {((tp + tn) / max(total, 1) * 100):.2f}%")
    return tp, tn, fp, fn


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    parser.add_argument("--ckpt", required=True, type=str)
    parser.add_argument("--label-depth", type=int, default=-5,
                        help="path component holding the class label")
    parser.add_argument("--val-path", type=str, default=None,
                        help="override cfg val_path (labeled fixture)")
    args = parser.parse_args()
    cfg = get_configs(args.cfg)
    if args.val_path:
        cfg["val_path"] = args.val_path
    run(cfg, args.ckpt, args.label_depth)
