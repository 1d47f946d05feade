"""Device mesh + sharding layer.

The reference's only parallelism is single-machine data-parallel DDP over
NCCL (reference: train_sbp.py:74, SURVEY.md section 5).  The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the slice's chips with the
batch dimension sharded on the ``data`` axis.  Gradients/BN statistics need
no explicit collectives -- ops on sharded arrays under jit let XLA insert
``all-reduce`` over ICI (and this is synchronous cross-replica BN, strictly
stronger than DDP's per-replica BN).

Multi-host: ``jax.distributed.initialize`` + per-host interleaved data
shards (data/pipeline.py process_index/process_count) extend the same mesh
over DCN; nothing in the train step changes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed(cfg: Optional[dict] = None) -> tuple:
    """Initialize jax.distributed for multi-host runs when configured.

    Triggers on cfg['multihost'] or the standard JAX coordination env vars
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS).  Returns
    (process_index, process_count) either way -- feed them to the data
    modules so each host loads an interleaved shard (the DistributedSampler
    replacement, see data/pipeline.py).
    """
    import os

    want = bool(cfg and cfg.get("multihost")) or \
        "JAX_COORDINATOR_ADDRESS" in os.environ or \
        "COORDINATOR_ADDRESS" in os.environ
    if want and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # pragma: no cover - single-host fallback
            print(f"jax.distributed.initialize failed ({e}); "
                  "continuing single-host")
    return jax.process_index(), jax.process_count()


def select_devices(devices_cfg: Union[str, int, Sequence[int], None]):
    """Resolve the config 'devices' field (reference YAML surface:
    'auto' = all, int n = first n, list = those indices)."""
    all_devices = jax.devices()
    if devices_cfg in (None, "auto"):
        return all_devices
    if isinstance(devices_cfg, int):
        return all_devices[:devices_cfg]
    return [all_devices[i] for i in devices_cfg]


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the image HEIGHT dim (NHWC dim 1) across the mesh: GSPMD
    inserts conv halo exchanges automatically.  The scaling axis for
    large-input (SPM 512^2+) or batch-1 inference across a slice --
    exactness vs single-device verified in tests/test_parallel.py."""
    return NamedSharding(mesh, P(None, axis))


def shard_host_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                     skip: Optional[Sequence[str]] = None):
    """device_put a dict of host numpy arrays with the batch dim sharded.
    Non-array entries (paths etc.) and ``skip`` keys stay on host."""
    skip = set(skip or ())
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k in skip or not isinstance(v, np.ndarray):
            out[k] = v
        else:
            out[k] = jax.device_put(v, sharding)
    return out
