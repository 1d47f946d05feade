"""Orbax checkpointing with the reference's directory/selection semantics.

Reference behavior (train_sbp.py:55-67, Lightning ModelCheckpoint):
``saved/<model>_<dataset>/version_N/checkpoints/`` holding
``epoch=E-step=S`` snapshots, a ``last`` checkpoint, and best-by-val_loss
selection; plus the backbone weight-surgery path (saving_weights.py:22-42)
that extracts backbone-only params for warm starts (sbp_pis.yaml
model_pretrained).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def next_version_dir(save_dir: str, model_name: str) -> str:
    base = os.path.join(save_dir, model_name)
    os.makedirs(base, exist_ok=True)
    n = 0
    while os.path.exists(os.path.join(base, f"version_{n}")):
        n += 1
    path = os.path.join(base, f"version_{n}")
    os.makedirs(os.path.join(path, "checkpoints"), exist_ok=True)
    return path


def _state_tree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    """Minimal manager: save(step/epoch), save_last, track best val_loss."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.best_val_loss = float("inf")
        self.best_path: Optional[str] = None

    def _save(self, name: str, state: TrainState, meta: dict) -> str:
        path = os.path.join(self.ckpt_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, _state_tree(state))
        self._ckptr.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        return path

    def save_epoch(self, state: TrainState, epoch: int,
                   val_loss: Optional[float] = None) -> Optional[str]:
        step = int(state.step)
        meta = {"epoch": epoch, "step": step, "val_loss": val_loss}
        path = self._save(f"epoch={epoch}-step={step}", state, meta)
        if val_loss is not None and val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            best = os.path.join(self.ckpt_dir, "best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            with open(best + ".meta.json", "w") as f:
                json.dump(meta, f)
            self.best_path = path
        return path

    def save_last(self, state: TrainState, epoch: int,
                  val_loss: Optional[float] = None) -> str:
        return self._save("last", state,
                          {"epoch": epoch, "step": int(state.step),
                           "val_loss": val_loss})


def save_checkpoint(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_tree(state))
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing (freshly created) state so optimizer-state
    pytree types survive the round trip."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      _state_tree(state))
    restored = ckptr.restore(path, abstract)
    return state.replace(step=restored["step"], params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"])


def restore_checkpoint_flexible(path: str, state: TrainState) -> TrainState:
    """Restore a full TrainState, or fall back to params/batch_stats-only
    checkpoints (e.g. converted reference torch weights, eval-only use)."""
    try:
        return restore_checkpoint(path, state)
    except Exception:
        tree = restore_params(path)
        return state.replace(params=tree["params"],
                             batch_stats=tree["batch_stats"])


def save_params(path: str, variables: dict) -> str:
    """Save a bare {params, batch_stats} tree (no optimizer state)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})
    ckptr.wait_until_finished()
    return path


def restore_params(path: str) -> dict:
    """Restore only {params, batch_stats} without needing a TrainState."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


# --------------------------------------------------------------------------
# weight surgery (reference: saving_weights.py)
# --------------------------------------------------------------------------

def extract_backbone(ckpt_path: str, out_path: str) -> str:
    """Save only the backbone subtree of a checkpoint's params/batch_stats
    (the reference's 'pretrained_weights.pt' warm-start artifact)."""
    tree = restore_params(ckpt_path)
    sub = {"params": {"backbone": tree["params"]["backbone"]},
           "batch_stats": {"backbone": tree["batch_stats"]["backbone"]}}
    out_path = os.path.abspath(out_path)
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_path, sub)
    ckptr.wait_until_finished()
    return out_path


def _merge(dst: Any, src: Any) -> Any:
    """Recursively overlay src onto dst where keys match (strict=False
    warm-start semantics, reference: train_sbp.py:44-46)."""
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            if k in out:
                out[k] = _merge(out[k], v)
        return out
    return np.asarray(src) if not isinstance(src, jax.Array) else src


def load_pretrained(state: TrainState, pretrained_path: str) -> TrainState:
    """Overlay a partial {params, batch_stats} checkpoint onto the state."""
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(pretrained_path))
    params = _merge(jax.tree_util.tree_map(lambda x: x, state.params),
                    tree.get("params", {}))
    stats = _merge(jax.tree_util.tree_map(lambda x: x, state.batch_stats),
                   tree.get("batch_stats", {}))
    return state.replace(params=params, batch_stats=stats)
