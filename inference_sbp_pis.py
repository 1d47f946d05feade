"""SBP-PIS inference with behavior-classifier overlays
(reference: inference_sbp_pis.py:17-173).

    python inference_sbp_pis.py --cfg configs/sbp_pis.yaml --ckpt CKPT \
        --pis {handle_grip,falling_down} [--save-dir DIR] [--limit N]
"""

import argparse
import os
import time

import cv2
import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPPISDataModule
from pytorch_pose_estimation_tpu.pis import FallingDown, HandleGrip
from pytorch_pose_estimation_tpu.train.trainer import load_sbp_predictor
from pytorch_pose_estimation_tpu.vis import get_pis_tagged_img_sbp

FONT = cv2.FONT_HERSHEY_SIMPLEX

# reference overlay constants (inference_sbp_pis.py:69-77)
HANDLE_ROI = ((1220, 1300), (1600, 1130))
NEG_MAX = -1
POS_MIN = 8


def _overlay_text(img, txt, color):
    size, _ = cv2.getTextSize(txt, FONT, 2, 2)
    cv2.putText(img, txt, (10, 10 + size[1]), FONT, 2, color, 2)


def inference(cfg, ckpt, pis, save_dir=None, limit=None):
    data_module = SBPPISDataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        input_size=cfg["input_size"], output_size=cfg["output_size"],
        num_keypoints=cfg["num_keypoints"], sigma=cfg["sigma"],
        workers=cfg["workers"], batch_size=1,
        class_labels=cfg["class_labels"])
    data_module.prepare_data()
    data_module.setup()

    # fused uint8->joints predictor: ONE jitted dispatch per batch
    predict = load_sbp_predictor(cfg, ckpt)
    in_h, in_w = cfg["input_size"]

    handle_cls = HandleGrip(HANDLE_ROI)
    falling_cls = FallingDown(NEG_MAX, POS_MIN)

    show = save_dir is None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    import jax.numpy as jnp

    for i, batch in enumerate(data_module.val_loader(batch_size=1)):
        if limit is not None and i >= limit:
            break
        bbox = batch["bbox"][0]
        org_img = cv2.imread(data_module.val_db[i]["image_path"])

        before = time.time()
        joints = np.asarray(predict(jnp.asarray(batch["image"])))[0]
        print(f"Inference: {(time.time() - before) * 1000:.2f}ms")

        joints[..., 0] = joints[..., 0] * (bbox[2] / in_w) + bbox[0]
        joints[..., 1] = joints[..., 1] * (bbox[3] / in_h) + bbox[1]

        if pis == "handle_grip":
            cv2.line(org_img, HANDLE_ROI[0], HANDLE_ROI[1], (255, 0, 0), 2)
            # right wrist = keypoint index 10
            grip = joints[10][-1] >= 0 and \
                handle_cls.get_handle_grip_result(joints[10][:2])
            _overlay_text(org_img, "Handle Grip" if grip else "No Grip",
                          (0, 200, 0) if grip else (0, 0, 255))
        elif pis == "falling_down":
            # nose = 0, shoulders = 5/6
            if joints[0][-1] >= 0 and joints[5][-1] >= 0 and \
                    joints[6][-1] >= 0:
                center = (joints[5][:2] + joints[6][:2]) / 2
                normal = falling_cls.get_falling_down_result(joints[0][:2],
                                                             center)
            else:
                normal = True
            _overlay_text(org_img, "Normal" if normal else "Falling Down",
                          (0, 200, 0) if normal else (0, 0, 255))

        tagged = get_pis_tagged_img_sbp(org_img, joints)
        if show:
            cv2.imshow("pred", tagged)
            if cv2.waitKey(0) == 27:
                break
        else:
            cv2.imwrite(os.path.join(save_dir, f"{i:06d}_pred.jpg"), tagged)
    if show:
        cv2.destroyAllWindows()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    parser.add_argument("--ckpt", required=True, type=str)
    parser.add_argument("--pis", type=str, default=None,
                        choices=["handle_grip", "falling_down"])
    parser.add_argument("--save-dir", type=str, default=None)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()
    inference(get_configs(args.cfg), args.ckpt, args.pis, args.save_dir,
              args.limit)
