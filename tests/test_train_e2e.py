"""End-to-end training smoke test on synthetic COCO data: the full
loader -> device augment -> target-gen -> fwd/bwd -> checkpoint -> validate
loop with the batch sharded over a 2-device sub-mesh of the virtual CPU
mesh.  (The 8-device layout is exercised by __graft_entry__.dryrun_multichip
and tests/test_parallel.py; XLA CPU compiles of 8-way-partitioned conv
graphs are too slow for the regular suite.)

Everything runs through ONE Trainer instance so the fused train step
compiles once.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
from pytorch_pose_estimation_tpu.train import Trainer

from synth_fixture import make_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("coco"))
    make_dataset(out, "train2017", 24, seed=0)
    make_dataset(out, "val2017", 10, seed=1)
    return out


def test_sbp_train_val_checkpoint(synth_root, tmp_path):
    import jax

    cfg = get_configs("configs/sbp_coco.yaml")
    cfg.update({
        "train_path": os.path.join(
            synth_root, "annotations", "person_keypoints_train2017.json"),
        "val_path": os.path.join(
            synth_root, "annotations", "person_keypoints_val2017.json"),
        "img_dir": synth_root,
        "input_size": [128, 96],
        "output_size": [32, 24],
        "batch_size": 8,
        "workers": 2,
        "epochs": 1,
        "save_dir": str(tmp_path / "saved"),
        "save_freq": 1,
        "precision": "fp32",
        "devices": 2,
        "trainer_options": {"check_val_every_n_epoch": 1},
        "scheduler_options": {"burn_in": 4, "steps": [100], "scales": [0.1]},
    })
    dm = SBPCOCODataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        img_dir=cfg["img_dir"], input_size=cfg["input_size"],
        output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"], workers=cfg["workers"],
        batch_size=cfg["batch_size"], class_labels=cfg["class_labels"])
    dm.setup()
    assert len(dm.train_db) > 0 and len(dm.val_db) > 0

    trainer = Trainer(cfg, dm, kind="sbp")
    assert trainer.n_devices == 2  # sub-mesh of the 8-device virtual mesh
    state = trainer.fit()
    assert int(state.step) > 0

    # checkpoints written with the reference directory scheme
    ckpt_dir = os.path.join(trainer.version_dir, "checkpoints")
    names = os.listdir(ckpt_dir)
    assert "last" in names
    assert any(n.startswith("epoch=") for n in names)

    # validate from the written checkpoint (restores into the live state)
    val_loss, val_map = trainer.validate(
        ckpt=os.path.join(ckpt_dir, "last"), verbose=False)
    assert np.isfinite(val_loss)
    assert 0.0 <= val_map <= 1.0
    assert os.path.exists("results.json")

    # a few more steps must reduce the loss (gradients flow through the
    # fused aug+target+model step) -- reuses the already-compiled step
    losses = []
    rng = jax.random.PRNGKey(0)
    loader = dm.train_loader()
    for epoch in range(5):
        loader.set_epoch(epoch)
        for batch in loader:
            rng, k = jax.random.split(rng)
            dev = trainer._device_batch(
                batch, ("image", "joints", "joints_vis"))
            trainer.state, loss = trainer.train_step(trainer.state, dev, k)
            losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_resume_continues_epoch_and_step(synth_root, tmp_path):
    """Regression: fit(resume=...) used to restore the params but restart
    the epoch loop and global step at 0, re-running epochs 0..N-1 on top
    of the restored state and relabeling checkpoints epoch=0.. (found live
    on the ref-scale run).  Resume must continue the epoch counter from
    the checkpoint meta and the step counter from state.step."""
    cfg = get_configs("configs/sbp_coco.yaml")
    cfg.update({
        "train_path": os.path.join(
            synth_root, "annotations", "person_keypoints_train2017.json"),
        "val_path": os.path.join(
            synth_root, "annotations", "person_keypoints_val2017.json"),
        "img_dir": synth_root,
        "input_size": [128, 96],
        "output_size": [32, 24],
        "batch_size": 8,
        "workers": 2,
        "epochs": 1,
        "save_dir": str(tmp_path / "saved"),
        "save_freq": 1,
        "precision": "fp32",
        "devices": 2,
        "trainer_options": {"check_val_every_n_epoch": 1},
        "scheduler_options": {"burn_in": 4, "steps": [100], "scales": [0.1]},
    })
    dm = SBPCOCODataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        img_dir=cfg["img_dir"], input_size=cfg["input_size"],
        output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"], workers=cfg["workers"],
        batch_size=cfg["batch_size"], class_labels=cfg["class_labels"])
    dm.setup()
    steps_per_epoch = len(dm.train_db) // cfg["batch_size"]

    state1 = Trainer(cfg, dm, kind="sbp").fit()
    assert int(state1.step) == steps_per_epoch  # 1 epoch done

    cfg2 = dict(cfg, epochs=3)
    tr2 = Trainer(cfg2, dm, kind="sbp")
    state2 = tr2.fit(resume="auto")
    # epochs 1 and 2 ran on top of the restored step counter...
    assert int(state2.step) == 3 * steps_per_epoch
    # ...and the new version dir holds epoch=1/epoch=2 checkpoints, not a
    # relabeled epoch=0
    names = os.listdir(os.path.join(tr2.version_dir, "checkpoints"))
    epochs = {n.split("-")[0] for n in names if n.startswith("epoch=")}
    assert epochs == {"epoch=1", "epoch=2"}, names
    meta_path = os.path.join(tr2.version_dir, "checkpoints",
                             "last.meta.json")
    import json
    with open(meta_path) as f:
        assert json.load(f)["epoch"] == 2
