"""Import reference PyTorch/Lightning checkpoints into flax param pytrees.

Supports the reference's two checkpoint layouts so trained reference
weights can be evaluated for decode-level parity:

* SBP/SPM detector checkpoints (Lightning ``state_dict`` with ``model.``
  prefixes, reference key scheme visible at saving_weights.py:36-40):
  ``model.backbone_features_module.<stage>.<idx>.conv.weight``,
  ``model.deconv_N.0.weight``, ``model.{sbp,spm}_head.0.weight``.
* darknet19 classifier checkpoints (attribute-named stages ``stem`` /
  ``layer1``..``layer5`` + ``classifier``, reference:
  models/backbone/darknet.py:138-150).

Weight layout conversions: conv [O,I,kh,kw] -> [kh,kw,I,O]; transposed
conv [I,O,kh,kw] -> flax transpose_kernel layout [kh,kw,O,I] (both are the
same transpose (2,3,1,0)).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .darknet import STAGES, STAGE_NAMES


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _stage_conv_index(stage_table, seq_idx: int) -> int:
    """Sequential position -> conv counter within a stage ('M' entries are
    parameterless maxpools occupying a position)."""
    conv_idx = 0
    for pos, entry in enumerate(stage_table):
        if pos == seq_idx:
            if entry == "M":
                raise KeyError(f"position {seq_idx} is a maxpool")
            return conv_idx
        if entry != "M":
            conv_idx += 1
    raise KeyError(f"position {seq_idx} out of range")


def _nested_set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_torch_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Map a reference state_dict (tensor or ndarray values) to
    {'params': ..., 'batch_stats': ...} for models.SBP / models.SPM."""
    params: dict = {}
    stats: dict = {}

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if not parts or parts[-1] == "num_batches_tracked":
            continue
        v = to_np(value)

        if parts[0] == "backbone_features_module":
            stage_i = int(parts[1])
            stage = STAGE_NAMES[stage_i]
            conv_i = _stage_conv_index(STAGES[stage_i], int(parts[2]))
            block = ("backbone", stage, f"conv{conv_i}")
            leaf = parts[3], parts[4]  # ('conv'|'bn', param name)
        elif parts[0] in STAGE_NAMES:
            stage = parts[0]
            conv_i = _stage_conv_index(STAGES[STAGE_NAMES.index(stage)],
                                       int(parts[1]))
            block = ("backbone", stage, f"conv{conv_i}")
            leaf = parts[2], parts[3]
        elif parts[0].startswith("deconv_"):
            block = (parts[0],)
            if parts[1] == "0":      # ConvTranspose2d
                _nested_set(params, block + ("deconv", "kernel"),
                            _conv_kernel(v))
                continue
            leaf = ("bn", parts[2])  # BatchNorm2d at Sequential index 1
        elif parts[0] in ("sbp_head", "spm_head"):
            _nested_set(params, ("head", "kernel"), _conv_kernel(v))
            continue
        elif parts[0] == "classifier":
            # classifier Sequential: [0] Conv2dBnRelu -> conv/bn
            block = ("classifier",)
            leaf = parts[2], parts[3]
        else:
            continue  # dropout etc.

        kind, name = leaf
        if kind == "conv":
            _nested_set(params, block + ("conv", "kernel"), _conv_kernel(v))
        elif kind == "bn":
            if name == "weight":
                _nested_set(params, block + ("bn", "scale"), v)
            elif name == "bias":
                _nested_set(params, block + ("bn", "bias"), v)
            elif name == "running_mean":
                _nested_set(stats, block + ("bn", "mean"), v)
            elif name == "running_var":
                _nested_set(stats, block + ("bn", "var"), v)
    return {"params": params, "batch_stats": stats}


def import_torch_checkpoint(path: str) -> dict:
    """Load a .ckpt/.pt file (Lightning checkpoint or bare state_dict) and
    convert it.  Requires torch (CPU) at call time only."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) \
        else blob
    return import_torch_state_dict(state_dict)
