"""Checkpoint round-trip, resume, and backbone-pretrained wiring tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_pose_estimation_tpu.models import SBP
from pytorch_pose_estimation_tpu.optim import get_optimizer
from pytorch_pose_estimation_tpu.train import create_train_state
from pytorch_pose_estimation_tpu.train.checkpoint import (
    CheckpointManager,
    extract_backbone,
    load_pretrained,
    restore_checkpoint,
    save_checkpoint,
)


def _tiny_state():
    model = SBP(num_keypoints=3)
    opt = get_optimizer("sgd", lr=1e-2, momentum=0.9)
    return create_train_state(model, opt, (1, 64, 64, 3)), model, opt


def test_save_restore_roundtrip(tmp_path):
    state, model, opt = _tiny_state()
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    fresh, _, _ = _tiny_state()
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 42
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state tree types survive (momentum trace restored)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_manager_best_and_last(tmp_path):
    state, _, _ = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "checkpoints"))
    mgr.save_epoch(state, epoch=0, val_loss=5.0)
    mgr.save_epoch(state.replace(step=jnp.asarray(10, jnp.int32)),
                   epoch=1, val_loss=3.0)
    mgr.save_epoch(state.replace(step=jnp.asarray(20, jnp.int32)),
                   epoch=2, val_loss=4.0)  # worse: best stays at epoch 1
    mgr.save_last(state.replace(step=jnp.asarray(20, jnp.int32)), epoch=2)
    names = set(os.listdir(str(tmp_path / "checkpoints")))
    assert {"best", "last", "epoch=0-step=0"} <= names
    import json
    meta = json.load(open(str(tmp_path / "checkpoints" / "best.meta.json")))
    assert meta["epoch"] == 1 and meta["val_loss"] == 3.0


def test_backbone_surgery_and_overlay(tmp_path):
    state, _, _ = _tiny_state()
    full = str(tmp_path / "full")
    save_checkpoint(full, state)
    surgery = extract_backbone(full, str(tmp_path / "bb"))

    other, _, _ = _tiny_state()
    # different init (head + backbone differ)
    other = other.replace(params=jax.tree_util.tree_map(
        lambda x: x + 1.0, other.params))
    warm = load_pretrained(other, surgery)
    np.testing.assert_array_equal(
        np.asarray(warm.params["backbone"]["stem"]["conv0"]["conv"]["kernel"]),
        np.asarray(state.params["backbone"]["stem"]["conv0"]["conv"]["kernel"]))
    # head untouched by backbone-only overlay
    np.testing.assert_array_equal(
        np.asarray(warm.params["head"]["kernel"]),
        np.asarray(other.params["head"]["kernel"]))


def test_decode_spm_batch_matches_per_sample():
    from pytorch_pose_estimation_tpu.ops import decode_spm, decode_spm_batch

    rng = np.random.RandomState(0)
    logits = rng.randn(3, 32, 32, 7).astype(np.float32)
    roots_b, kps_b = decode_spm_batch(jnp.asarray(logits), 128, 1.0, 0.6,
                                      True, 10)
    for i in range(3):
        r, k = decode_spm(jnp.asarray(np.transpose(logits[i], (2, 0, 1))),
                          128, 1.0, 0.6, True, 10)
        np.testing.assert_allclose(np.asarray(roots_b)[i], np.asarray(r),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(kps_b)[i], np.asarray(k),
                                   rtol=1e-6)
