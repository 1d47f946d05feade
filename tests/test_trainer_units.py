"""Trainer helper unit tests (no heavy compiles)."""

import os

import numpy as np

from pytorch_pose_estimation_tpu.config import get_configs
from pytorch_pose_estimation_tpu.train.trainer import Trainer


def _mk_trainer(tmp_path, **over):
    cfg = get_configs("configs/sbp_coco.yaml")
    cfg.update({
        "train_path": "/nonexistent",
        "val_path": "/nonexistent",
        "img_dir": "/nonexistent",
        "input_size": [64, 64],
        "output_size": [16, 16],
        "save_dir": str(tmp_path / "saved"),
        "devices": 2,
        "precision": "fp32",
    })
    cfg.update(over)

    class DummyDM:
        train_db = []
        val_db = []

    return Trainer(cfg, DummyDM(), kind="sbp", logging=False)


def test_pad_to_devices(tmp_path):
    tr = _mk_trainer(tmp_path)
    batch = {"image": np.zeros((5, 4, 4, 3), np.uint8),
             "joints": np.zeros((5, 17, 2), np.float32)}
    padded, n = tr._pad_to_devices(batch, ("image", "joints"))
    assert n == 5
    assert padded["image"].shape[0] == 6  # next multiple of 2
    np.testing.assert_array_equal(padded["image"][5], padded["image"][0])

    batch = {"image": np.zeros((4, 4, 4, 3), np.uint8)}
    same, n = tr._pad_to_devices(batch, ("image",))
    assert n == 4 and same["image"].shape[0] == 4


def test_find_auto_resume(tmp_path):
    import json

    tr = _mk_trainer(tmp_path)
    assert tr._find_auto_resume() is None

    base = os.path.join(str(tmp_path / "saved"),
                        "simple-baselines-pose_coco-keypoints")

    def mk(version, name, step=None):
        path = os.path.join(base, version, "checkpoints", name)
        os.makedirs(path)
        if step is not None:
            with open(path + ".meta.json", "w") as f:
                json.dump({"epoch": 0, "step": step}, f)
        return path

    # kill-mid-save recovery: version_1's 'last' exists only as a
    # half-written orbax tmp dir -> fall back to the newest finalized
    # epoch checkpoint, across versions
    os.makedirs(os.path.join(base, "version_0", "checkpoints"))
    mk("version_0", "epoch=4-step=190")
    e24 = mk("version_1", "epoch=24-step=950")
    mk("version_1", "last.orbax-checkpoint-tmp")
    mk("version_1", "best", step=570)  # never picked
    assert tr._find_auto_resume() == e24

    # a finalized 'last' at the same step wins the tie over epoch=...
    last = mk("version_1", "last", step=950)
    assert tr._find_auto_resume() == last

    # ...but a newer epoch checkpoint beats a stale 'last'
    e29 = mk("version_2", "epoch=29-step=1140")
    assert tr._find_auto_resume() == e29


def test_metric_absent_without_val(tmp_path):
    tr = _mk_trainer(tmp_path)
    assert tr.metric is None


def test_load_for_inference_matches_eval_normalization(tmp_path):
    """load_for_inference must apply the same Normalize(0,1) as the eval
    step (regression: raw 0-255 pixels were fed to the model once)."""
    import jax
    import jax.numpy as jnp
    from pytorch_pose_estimation_tpu.train.trainer import load_for_inference
    from pytorch_pose_estimation_tpu.train.checkpoint import save_checkpoint

    from pytorch_pose_estimation_tpu.ops.image import normalize_batch

    tr = _mk_trainer(tmp_path, devices=1)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, tr.state)
    _, fwd = load_for_inference(tr.cfg, ckpt, kind="sbp")

    img = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), np.uint8)
    # the eval path normalizes uint8 batches with /255 before the model
    want = tr.model.apply(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        normalize_batch(jnp.asarray(img)), train=False)
    got = fwd(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_load_sbp_predictor_fuses_forward_and_decode(tmp_path):
    """load_sbp_predictor (one jitted uint8->joints dispatch) must equal
    load_for_inference + decode_sbp_batch run as two dispatches
    (reference probe: inference_sbp.py:70-74)."""
    import jax.numpy as jnp
    from pytorch_pose_estimation_tpu.ops import decode_sbp_batch
    from pytorch_pose_estimation_tpu.train.checkpoint import save_checkpoint
    from pytorch_pose_estimation_tpu.train.trainer import (
        load_for_inference, load_sbp_predictor)

    tr = _mk_trainer(tmp_path, devices=1)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, tr.state)

    _, fwd = load_for_inference(tr.cfg, ckpt, kind="sbp")
    predict = load_sbp_predictor(tr.cfg, ckpt)

    img = np.random.RandomState(1).randint(0, 255, (2, 64, 64, 3), np.uint8)
    logits = fwd(jnp.asarray(img))
    want = decode_sbp_batch(logits, tr.cfg["input_size"][1],
                            tr.cfg["conf_threshold"], True)
    got = predict(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
