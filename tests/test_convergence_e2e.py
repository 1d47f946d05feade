"""Convergence as a CI property (VERDICT.md round-1 weak item 5): training
from scratch on a tiny synthetic set must actually LEARN -- val mAP
(AP@OKS=.50 through the real results.json -> OKS evaluator path) must
cross a real threshold, not merely stay in [0, 1].

Runs the full production path: SBPCOCODataModule -> Trainer with the
device-resident data cache (cache_device) on a 2-device sub-mesh, fused
augment+target+train step, on-device decode, COCO OKS eval.  Training is
chunked so the test stops as soon as the threshold is crossed; if
learning breaks (loss wiring, target gen, decode, eval, or optimizer),
AP stays near 0 and the test fails at the epoch cap.
"""

import os

import pytest

pytestmark = pytest.mark.slow

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
from pytorch_pose_estimation_tpu.train import Trainer

from synth_fixture import make_dataset

AP_THRESHOLD = 0.55
EPOCHS_PER_ROUND = 4
MAX_ROUNDS = 20


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("coco_conv"))
    # identical 16-image train and val sets (same seed): the property under
    # test is "the pipeline can fit data it trains on", the strongest
    # signal per step on a bounded CPU budget
    make_dataset(out, "train2017", 16, seed=7)
    make_dataset(out, "val2017", 16, seed=7)
    return out


def test_sbp_trains_to_ap_threshold(synth_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # results.json artifact stays in tmp
    cfg = get_configs(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "sbp_coco.yaml"))
    cfg.update({
        "train_path": os.path.join(
            synth_root, "annotations", "person_keypoints_train2017.json"),
        "val_path": os.path.join(
            synth_root, "annotations", "person_keypoints_val2017.json"),
        "img_dir": synth_root,
        "input_size": [128, 96],
        "output_size": [32, 24],
        "batch_size": 16,
        "workers": 2,
        "epochs": EPOCHS_PER_ROUND,
        "precision": "fp32",
        "devices": 2,
        "cache_device": True,
        # mild augmentation: full-strength RRC/rotate on 16 images would
        # slow small-set convergence far past a CI budget; distribution
        # parity of the full-strength pipeline is pinned by
        # tests/test_augment_distribution.py
        "augment_options": {"rotate_limit": 15.0, "rotate_prob": 0.3,
                            "jitter_prob": 0.3,
                            "scale_range": [0.8, 1.0],
                            "ratio_range": [0.9, 1.1]},
        "clahe": "off",
        "trainer_options": {"check_val_every_n_epoch": 10 ** 9},
        "scheduler_options": {"burn_in": 10, "steps": [10 ** 6],
                              "scales": [0.1]},
    })
    dm = SBPCOCODataModule(
        train_path=cfg["train_path"], val_path=cfg["val_path"],
        img_dir=cfg["img_dir"], input_size=cfg["input_size"],
        output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
        sigma=cfg["sigma"], workers=cfg["workers"],
        batch_size=cfg["batch_size"], class_labels=cfg["class_labels"])
    dm.setup()

    trainer = Trainer(cfg, dm, kind="sbp", logging=False)
    best = 0.0
    for rnd in range(MAX_ROUNDS):
        # fit() seeds its augmentation stream from cfg['seed']; vary it so
        # chunked rounds don't replay identical augmented batches
        trainer.cfg["seed"] = 7 + rnd
        trainer.fit()  # EPOCHS_PER_ROUND epochs on the device cache
        _, val_map = trainer.validate(verbose=False)
        best = max(best, val_map)
        print(f"round {rnd}: val_mAP={val_map:.3f} (best {best:.3f})")
        if best >= AP_THRESHOLD:
            break
    assert best >= AP_THRESHOLD, (
        f"AP@.5 reached only {best:.3f} after "
        f"{MAX_ROUNDS * EPOCHS_PER_ROUND} epochs -- learning is broken")
