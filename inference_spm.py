"""Whole-image SPM inference: decode root joints + keypoints, visualize,
print per-image latency (reference: inference_spm.py).

    python inference_spm.py --cfg configs/spm_coco.yaml --ckpt CKPT \
        [--save-dir DIR] [--limit N]
"""

import argparse
import os
import time

import cv2
import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SPMCOCODataModule
from pytorch_pose_estimation_tpu.ops import DecodeSPM
from pytorch_pose_estimation_tpu.train.trainer import load_for_inference
from pytorch_pose_estimation_tpu.vis import get_tagged_img_spm


def inference(cfg, ckpt, save_dir=None, limit=None):
    data_module = SPMCOCODataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        img_dir=cfg["img_dir"], input_size=cfg["input_size"],
        output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"], workers=cfg["workers"], batch_size=1,
        class_labels=cfg["class_labels"],
        max_persons=cfg.get("max_persons", 30))
    data_module.prepare_data()
    data_module.setup()

    _, forward = load_for_inference(cfg, ckpt, kind="spm")
    decoder = DecodeSPM(cfg["input_size"], cfg["sigma"],
                        cfg["conf_threshold"], pred=True,
                        max_persons=cfg.get("max_persons", 30))

    show = save_dir is None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    import jax.numpy as jnp

    for i, batch in enumerate(data_module.val_loader(batch_size=1)):
        if limit is not None and i >= limit:
            break
        img = jnp.asarray(batch["image"])
        before = time.time()
        logits = forward(img)
        x = np.transpose(np.asarray(logits)[0], (2, 0, 1))
        roots, kps = decoder(x[None])
        print(f"Inference: {(time.time() - before) * 1000:.2f}ms")

        vis_img = cv2.cvtColor(batch["image"][0], cv2.COLOR_RGB2BGR)
        tagged = get_tagged_img_spm(vis_img, roots[:, :2], kps[..., :2])

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
    parser.add_argument("--ckpt", required=True, type=str,
                        help="checkpoint dir")
    parser.add_argument("--save-dir", type=str, default=None)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()
    inference(get_configs(args.cfg), args.ckpt, args.save_dir, args.limit)
