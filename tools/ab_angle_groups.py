"""A/B evidence run (VERDICT r3 item 4): grouped rotation angles (G=8)
vs fully per-sample rotation (G=256 = batch, the reference's A.Rotate
semantics, dataset/sbp_coco_dataset.py:220-232) at the reference's batch
size on the ref-scale corpus, on the real chip.

    python tools/ab_angle_groups.py 8   [epochs]
    python tools/ab_angle_groups.py 256 [epochs]
"""
import json
import os
import sys
import time

# runnable as `python tools/ab_angle_groups.py` (script dir is tools/,
# the package lives at the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
from pytorch_pose_estimation_tpu.train import Trainer

G = int(sys.argv[1])
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 60

cfg = get_configs("configs/sbp_synth_ref.yaml")
cfg.update({
    "dataset_name": f"ab-angles-g{G}",
    "epochs": EPOCHS,
    "save_dir": "./saved_ab",
    "augment_options": {"angle_groups": G},
    "trainer_options": {"check_val_every_n_epoch": 10},
    "seed": 0,
})
dm = SBPCOCODataModule(
    train_path=cfg["train_path"], val_path=cfg["val_path"],
    img_dir=cfg["img_dir"], input_size=cfg["input_size"],
    output_size=cfg["output_size"], num_keypoints=cfg["num_keypoints"],
    sigma=cfg["sigma"], workers=cfg["workers"],
    batch_size=cfg["batch_size"], class_labels=cfg["class_labels"])
dm.setup()
# logging=True: checkpoints land under saved_ab/ (the G=16 arm's best
# checkpoint doubles as the backbone-surgery source for the PIS run)
tr = Trainer(cfg, dm, kind="sbp", logging=True)
t0 = time.time()
tr.fit()
val_loss, ap = tr.validate(verbose=False)
print(json.dumps({"G": G, "epochs": EPOCHS, "val_loss": round(val_loss, 4),
                  "ap50": round(float(ap), 4),
                  "wall_s": round(time.time() - t0),
                  "version_dir": tr.version_dir}), flush=True)
