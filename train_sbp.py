"""Train the SBP (Simple Baselines) pose model.

CLI surface matches the reference (reference: train_sbp.py:82-88):
    python train_sbp.py --cfg configs/sbp_coco.yaml [--resume CKPT]
"""

import argparse

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
from pytorch_pose_estimation_tpu.train import Trainer


def train(cfg, resume=None):
    data_module = SBPCOCODataModule(
        train_path=cfg["train_path"],
        val_path=cfg["val_path"],
        img_dir=cfg["img_dir"],
        input_size=cfg["input_size"],
        output_size=cfg["output_size"],
        num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"],
        workers=cfg["workers"],
        batch_size=cfg["batch_size"],
        class_labels=cfg["class_labels"],
        cache_images=bool(cfg.get("cache_images", False)),
    )
    data_module.prepare_data()
    data_module.setup()

    trainer = Trainer(cfg, data_module, kind="sbp")
    trainer.summary()
    trainer.fit(resume=resume)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume from")
    args = parser.parse_args()
    train(get_configs(args.cfg), args.resume)
