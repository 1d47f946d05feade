"""Evaluate an SPM checkpoint on the validation set (val_loss + COCO OKS
AP summary through the multi-person decode).  The reference never
finished SPM and ships no SPM eval CLI (reference: README.md:7-9); this
mirrors the test_sbp.py surface (reference: test_sbp.py:57-64) for the
model family this framework completed:

    python test_spm.py --cfg configs/spm_coco.yaml --ckpt CKPT
"""

import argparse

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SPMCOCODataModule
from pytorch_pose_estimation_tpu.train import Trainer


def test(cfg, ckpt):
    data_module = SPMCOCODataModule(
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
        max_persons=cfg.get("max_persons", 30),
    )
    data_module.prepare_data()
    data_module.setup()

    trainer = Trainer(cfg, data_module, kind="spm", logging=False)
    trainer.summary()
    return trainer.validate(ckpt=ckpt)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, type=str, help="config file")
    parser.add_argument("--ckpt", required=True, type=str,
                        help="checkpoint dir")
    args = parser.parse_args()
    test(get_configs(args.cfg), args.ckpt)
