"""SPM (bottom-up) and PIS (11-keypoint) end-to-end smoke tests, plus the
weight-surgery warm-start chain (SBP ckpt -> backbone extract -> PIS)."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import (SBPPISDataModule,
                                              SPMCOCODataModule)
from pytorch_pose_estimation_tpu.train import Trainer

from synth_fixture import make_dataset, make_pis_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("spm_coco"))
    make_dataset(out, "train2017", 8, seed=0, img_size=(256, 256))
    make_dataset(out, "val2017", 4, seed=1, img_size=(256, 256))
    return out


@pytest.fixture(scope="module")
def pis_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pis"))
    make_pis_dataset(out, "train", 8, seed=2)
    make_pis_dataset(out, "valid", 4, seed=3)
    return out


def test_spm_train_and_validate(synth_root, tmp_path):
    cfg = get_configs("configs/spm_coco.yaml")
    cfg.update({
        "train_path": os.path.join(
            synth_root, "annotations", "person_keypoints_train2017.json"),
        "val_path": os.path.join(
            synth_root, "annotations", "person_keypoints_val2017.json"),
        "img_dir": synth_root,
        "input_size": 128,
        "output_size": 32,
        "batch_size": 4,
        "workers": 2,
        "epochs": 1,
        "max_persons": 8,
        "save_dir": str(tmp_path / "saved"),
        "save_freq": 1,
        "precision": "fp32",
        "devices": 2,
        "trainer_options": {"check_val_every_n_epoch": 1},
        "scheduler_options": {"burn_in": 4, "steps": [100], "scales": [0.1]},
    })
    dm = SPMCOCODataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        img_dir=cfg["img_dir"], input_size=cfg["input_size"],
        output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"], workers=cfg["workers"],
        batch_size=cfg["batch_size"], class_labels=cfg["class_labels"],
        max_persons=cfg["max_persons"])
    dm.setup()
    assert len(dm.train_db) == 8 and len(dm.val_db) == 4

    batch = next(iter(dm.val_loader()))
    assert batch["image"].shape == (4, 128, 128, 3)
    assert batch["joints"].shape == (4, 8, 17, 2)
    assert batch["centers"].shape == (4, 8, 1, 2)

    trainer = Trainer(cfg, dm, kind="spm")
    state = trainer.fit()
    assert int(state.step) > 0
    val_loss, val_map = trainer.validate(verbose=False)
    assert np.isfinite(val_loss)
    assert 0.0 <= val_map <= 1.0

    # the SPM eval CLI reproduces the validation from the written
    # checkpoint (test_spm.py mirrors test_sbp.py's surface for the
    # model family the reference left unfinished)
    import test_spm as test_spm_cli

    ckpt = os.path.join(trainer.version_dir, "checkpoints", "last")
    cli_loss, cli_map = test_spm_cli.test(dict(cfg), ckpt)
    assert np.isfinite(cli_loss)
    assert abs(cli_loss - val_loss) < 1e-3 * max(1.0, abs(val_loss))


def test_pis_train_surgery_warmstart(pis_root, tmp_path):
    cfg = get_configs("configs/sbp_pis.yaml")
    cfg.update({
        "train_path": os.path.join(pis_root, "annotations",
                                   "pis_person_keypoints_train.json"),
        "val_path": os.path.join(pis_root, "annotations",
                                 "pis_person_keypoints_valid.json"),
        "model_pretrained": "",
        "input_size": [128, 96],
        "output_size": [32, 24],
        "batch_size": 4,
        "workers": 2,
        "epochs": 1,
        "save_dir": str(tmp_path / "saved"),
        "save_freq": 1,
        "precision": "fp32",
        "devices": 2,
        "trainer_options": {"check_val_every_n_epoch": 1},
        "scheduler_options": {"burn_in": 4, "steps": [100], "scales": [0.1]},
    })
    dm = SBPPISDataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        input_size=cfg["input_size"], output_size=cfg["output_size"],
        num_keypoints=cfg["num_keypoints"], sigma=cfg["sigma"],
        workers=cfg["workers"], batch_size=cfg["batch_size"],
        class_labels=cfg["class_labels"])
    dm.setup()
    assert len(dm.train_db) == 8  # absolute-path annotations resolve

    trainer = Trainer(cfg, dm, kind="pis")
    trainer.fit()
    ckpt_dir = os.path.join(trainer.version_dir, "checkpoints")
    last = os.path.join(ckpt_dir, "last")

    # metric produced 11-kp results padded to 17 COCO slots
    val_loss, val_map = trainer.validate(ckpt=last, verbose=False)
    assert np.isfinite(val_loss)
    import json
    with open("results.json") as f:
        res = json.load(f)
    assert len(res[0]["keypoints"]) == 17 * 3

    # weight surgery: extract backbone, warm-start a fresh PIS model
    from pytorch_pose_estimation_tpu.train.checkpoint import extract_backbone

    surgery = extract_backbone(last, str(tmp_path / "pretrained_weights"))
    cfg2 = dict(cfg)
    cfg2["model_pretrained"] = surgery
    trainer2 = Trainer(cfg2, dm, kind="pis", logging=False)
    # backbone params equal the donor's, head params differ (fresh init)
    donor_bb = jax.tree_util.tree_leaves(trainer.state.params["backbone"])
    warm_bb = jax.tree_util.tree_leaves(trainer2.state.params["backbone"])
    for a, b in zip(donor_bb, warm_bb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(
        np.asarray(trainer.state.params["head"]["kernel"]),
        np.asarray(trainer2.state.params["head"]["kernel"]))


def test_pis_behavior_classifiers():
    from pytorch_pose_estimation_tpu.pis import FallingDown, HandleGrip

    grip = HandleGrip(((0, 100), (100, 0)))  # line y = 100 - x
    # at y=50 the line is at x=50: right of it = grip
    assert grip.get_handle_grip_result((80, 50))
    assert not grip.get_handle_grip_result((20, 50))

    fall = FallingDown(neg_max=-1, pos_min=8)
    # upright: nose nearly above shoulder center -> steep gradient
    assert fall.get_falling_down_result((100, 50), (101, 150))
    # fallen: shallow gradient
    assert not fall.get_falling_down_result((100, 100), (160, 120))
