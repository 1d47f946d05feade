"""Classifier pretraining path: data module, a training step via the CLI
module, and the classifier-ckpt -> pose-backbone warm-start glue."""

import os

import cv2
import numpy as np
import pytest


def _make_imagefolder(root, split, classes=3, per_class=4, size=64, seed=0):
    rng = np.random.RandomState(seed)
    for c in range(classes):
        d = os.path.join(root, split, f"class_{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = np.full((size, size, 3), 40 + 60 * c, np.uint8)
            cv2.circle(img, (rng.randint(8, size - 8),
                             rng.randint(8, size - 8)), 6,
                       (255, 255, 255), -1)
            cv2.imwrite(os.path.join(d, f"{i}.jpg"), img)
    return os.path.join(root, split)


def test_imagefolder_datamodule(tmp_path):
    from pytorch_pose_estimation_tpu.data.classifier_dataset import (
        ImageFolderDataModule,
    )

    root = str(tmp_path)
    train_dir = _make_imagefolder(root, "train")
    val_dir = _make_imagefolder(root, "val", per_class=2, seed=1)
    dm = ImageFolderDataModule(train_dir, val_dir, input_size=64,
                               workers=2, batch_size=4)
    dm.setup()
    assert dm.classes == ["class_0", "class_1", "class_2"]
    assert len(dm.train_db) == 12 and len(dm.val_db) == 6
    batch = next(iter(dm.train_loader()))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["label"].shape == (4,)
    assert set(batch["label"].tolist()) <= {0, 1, 2}


def test_classifier_train_and_backbone_warmstart(tmp_path):
    from train_classifier import train
    from pytorch_pose_estimation_tpu.train.trainer import Trainer
    from pytorch_pose_estimation_tpu.config import get_configs

    root = str(tmp_path)
    train_dir = _make_imagefolder(root, "train", per_class=6)
    val_dir = _make_imagefolder(root, "val", per_class=2, seed=1)

    cfg = get_configs("configs/darknet19_classifier.yaml")
    cfg.update({
        "train_dir": train_dir, "val_dir": val_dir,
        "batch_size": 6, "workers": 2, "epochs": 1,
        "check_val_every_n_epoch": 1,
        "save_dir": str(tmp_path / "saved"),
        "precision": "fp32", "devices": 2,
        "optimizer_options": {"lr": 1e-2, "momentum": 0.9},
    })
    cfg.pop("scheduler", None)
    cfg.pop("scheduler_options", None)
    state = train(cfg)
    ckpt_dir = os.path.join(str(tmp_path / "saved"),
                            "darknet19_tiny-imagenet", "version_0",
                            "checkpoints", "last")
    assert os.path.isdir(ckpt_dir)

    # warm-start a pose trainer's backbone from the classifier checkpoint
    pose_cfg = get_configs("configs/sbp_coco.yaml")
    pose_cfg.update({
        "train_path": "/nonexistent", "val_path": "/nonexistent",
        "img_dir": "/nonexistent", "input_size": [64, 64],
        "output_size": [16, 16], "save_dir": str(tmp_path / "saved2"),
        "devices": 2, "precision": "fp32",
        "backbone_pretrained": ckpt_dir,
    })

    class DummyDM:
        train_db = []
        val_db = []

    tr = Trainer(pose_cfg, DummyDM(), kind="sbp", logging=False)
    got = np.asarray(
        tr.state.params["backbone"]["stem"]["conv0"]["conv"]["kernel"])
    want = np.asarray(state.params["stem"]["conv0"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, want)
