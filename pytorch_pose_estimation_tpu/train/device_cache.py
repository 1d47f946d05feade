"""Device-resident training-set cache (``cache_device: true``).

The reference feeds every batch through 32 host DataLoader workers and a
PCIe copy (reference: dataset/sbp_coco_dataset.py:259-277).  On this
framework all randomized augmentation already runs on device inside the
jitted train step, so the per-instance host product is a DETERMINISTIC
uint8 crop -- which means the whole training set can live in HBM: a
256x192 crop is 147 KB, so even the reference's full 64,115-instance COCO
train split is ~9.4 GB, inside a single v5e chip's 16 GB.  After a
one-time upload, the feed path per step is a [B] int32 index array (1 KB)
instead of a 37 MB pixel batch, with the host loader and the H2D link out
of the hot loop entirely.

The hot loop itself is ``make_epoch_runner``: a ``lax.scan`` over the
epoch's [S, B] index matrix with the shard-local gather folded into the
scanned train step, so a whole epoch is ONE device dispatch.  Measured
steady state on the v5e tunnel backend: 107 ms/step at batch 256 = 2,386
img/s, equal to the bare fused train step.  (Backend artifact to know:
the FIRST post-compile execution of any fresh executable runs ~40x slow
one time -- 212 s compile -> 42.5 s -> 1.07 s -> 1.07 s ... for this
program -- and per-step Python dispatch additionally degrades to ~4 s/
step when many dispatches queue unsynced behind a fresh compile, which
is what round 2's 63.6 img/s figure measured.  One dispatch per epoch
makes the steady state the common case and pays the artifact once.)

Batches are gathered on device via a ``shard_map`` over the data mesh:
each device holds a contiguous shard of the (padded) instance axis and
gathers only from its own shard, so the per-step index gather is purely
local (no collectives).  Shuffling is therefore per-shard rather than
global: the DB order is globally permuted ONCE (seeded) before sharding,
then each epoch draws an independent permutation inside every shard --
the same stratified-shuffle semantics as torch's DistributedSampler
(shard assignment fixed across epochs, order within a shard random).
Shards are padded to equal length by wraparound, as in data/pipeline.py.

Single-host only (the cache holds the full instance set; multi-host runs
keep the streaming host loader with interleaved per-process shards).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS


class DeviceDataCache:
    """Holds train arrays sharded over the mesh's data axis and serves
    per-epoch batches gathered on device.

    arrays: dict of [N, ...] host numpy arrays (same leading N).  The
    leading axis is permuted once by ``seed``, padded by wraparound to a
    multiple of the mesh size, and uploaded with the instance axis sharded.
    """

    def __init__(self, mesh: Mesh, arrays: Dict[str, np.ndarray],
                 batch_size: int, seed: int = 0):
        if jax.process_count() > 1:
            raise NotImplementedError(
                "cache_device is single-host; multi-host runs use the "
                "streaming loader with per-process shards")
        names = sorted(arrays)
        n = len(arrays[names[0]])
        if n == 0:
            raise ValueError("empty dataset")
        self.mesh = mesh
        self.n_devices = int(mesh.devices.size)
        self.batch_size = int(batch_size)
        if self.batch_size % self.n_devices:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{self.n_devices}")
        self.seed = int(seed)
        self._names = names

        # one global permutation so fixed shard assignment is not
        # correlated with DB (file/annotation) order
        rng = np.random.RandomState((seed * 2654435761 + 97) % (2 ** 32))
        order = rng.permutation(n)
        n_pad = -(-n // self.n_devices) * self.n_devices
        if n_pad > n:
            order = np.concatenate([order, order[:n_pad - n]])
        self.n_total = n_pad
        self.n_local = n_pad // self.n_devices
        self.per_device_batch = self.batch_size // self.n_devices
        if self.per_device_batch > self.n_local:
            raise ValueError(
                f"per-device batch {self.per_device_batch} exceeds the "
                f"{self.n_local}-instance device shard")
        self.steps_per_epoch = self.n_local // self.per_device_batch

        sharded = NamedSharding(mesh, P(DATA_AXIS))
        self._data = {k: jax.device_put(arrays[k][order], sharded)
                      for k in names}
        self._idx_sharding = sharded

        in_specs = (P(DATA_AXIS),) + tuple(P(DATA_AXIS) for _ in names)
        out_specs = tuple(P(DATA_AXIS) for _ in names)

        @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs)
        def _gather(idx, *arrs):
            # idx is shard-local: every device reads only its own rows
            return tuple(jnp.take(a, idx, axis=0) for a in arrs)

        self._gather_fn = _gather          # traceable (for the scan runner)
        self._gather = jax.jit(_gather)    # standalone (epoch_batches)

    # ------------------------------------------------------------------
    def nbytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize
                   for a in self._data.values())

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """[steps_per_epoch, batch] int32 shard-local row indices for one
        epoch: an independent permutation inside each device shard, cut
        into per-step slices (drop_last semantics, matching the host train
        loader).  Row s, cols d*pb:(d+1)*pb are device d's rows for step s."""
        rng = np.random.RandomState(
            (self.seed * 1000003 + int(epoch)) % (2 ** 32))
        # independent permutation inside each device shard
        perms = np.stack([rng.permutation(self.n_local)
                          for _ in range(self.n_devices)])  # [D, n_local]
        pb = self.per_device_batch
        s_end = self.steps_per_epoch * pb
        # [D, S, pb] -> [S, D*pb]
        cut = perms[:, :s_end].reshape(self.n_devices,
                                       self.steps_per_epoch, pb)
        return cut.transpose(1, 0, 2).reshape(
            self.steps_per_epoch, self.batch_size).astype(np.int32)

    def epoch_batches(self, epoch: int) -> Iterator[Dict[str, jax.Array]]:
        """Yields ``steps_per_epoch`` batch dicts, already sharded over the
        mesh (drop_last semantics, matching the host train loader)."""
        for local in self.epoch_indices(epoch):
            idx = jax.device_put(local, self._idx_sharding)
            out = self._gather(idx, *(self._data[k] for k in self._names))
            yield dict(zip(self._names, out))

    def make_epoch_runner(self, train_step, chunk_steps: int = None):
        """Fold N train epochs into ONE device dispatch (or a few).

        Returns ``runner(state, rng, epochs) -> (state, rng, losses)``
        where ``epochs`` is a sequence of epoch numbers whose index
        matrices are stacked and scanned:  ``lax.scan`` carries
        ``(state, rng)``, each scanned step splits the carried rng exactly
        like Trainer.fit's per-step path (``rng, step_key = split(rng)``),
        gathers its [B] rows shard-locally, and runs the (unjitted) train
        step -- so the runner's parameter trajectory is bit-identical to
        dispatching the steps one by one, while the host dispatches once
        per call instead of once per step.  ``losses`` is the per-step
        loss array, [len(epochs) * steps_per_epoch].

        ``chunk_steps`` bounds how many scanned steps one device program
        executes: the stacked index matrix is cut into <=chunk_steps
        slices dispatched sequentially through the same jitted scan
        (carried state/rng, so the trajectory is unchanged).  This exists
        because on this backend the FIRST post-compile execution of a
        fresh executable runs ~40x slow, and a single program that runs
        tens of minutes trips the TPU runtime's execution watchdog, which
        kills the worker outright ("TPU worker process crashed or
        restarted", observed on SPM-512 whose 156-step epoch would run
        ~26 min at 40x) -- see DESIGN.md "SPM postmortem".  Chunks of
        equal length share one executable; at most two scan lengths
        (chunk and remainder) are ever compiled.

        The cache arrays enter as jit arguments (not closure constants) so
        XLA aliases HBM instead of embedding 100s of MB in the executable.
        """
        raw_step = getattr(train_step, "__wrapped__", train_step)
        names = self._names
        gather = self._gather_fn

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _run(state, rng, idx_steps, *data):
            def body(carry, idx):
                st, key = carry
                key, step_key = jax.random.split(key)
                batch = dict(zip(names, gather(idx, *data)))
                st, loss = raw_step(st, batch, step_key)
                return (st, key), loss

            (state, rng), losses = jax.lax.scan(body, (state, rng),
                                                idx_steps)
            return state, rng, losses

        steps_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def runner(state, rng, epochs):
            idx = np.concatenate([self.epoch_indices(e) for e in epochs])
            chunk = int(chunk_steps) if chunk_steps else len(idx)
            loss_parts = []
            for lo in range(0, len(idx), chunk):
                part = jax.device_put(idx[lo:lo + chunk], steps_sharding)
                state, rng, losses = _run(
                    state, rng, part, *(self._data[k] for k in names))
                loss_parts.append(losses)
            return state, rng, (loss_parts[0] if len(loss_parts) == 1
                                else jnp.concatenate(loss_parts))

        return runner


def _disk_cache_dir(data_module, keys: Sequence[str]) -> str | None:
    """Location + identity of the on-disk decoded-instance cache.  Returns
    None when the data module has no train annotation path to anchor it."""
    ann = getattr(data_module, "train_path", None)
    if not ann or not os.path.exists(ann):
        return None
    return ann + ".devcache"


def _disk_cache_meta(data_module, keys: Sequence[str], n: int) -> dict:
    ann = data_module.train_path
    size = data_module.input_size
    return {
        "version": 1,
        "ann_mtime": os.path.getmtime(ann),
        "ann_size": os.path.getsize(ann),
        "input_size": list(size) if isinstance(size, (list, tuple))
        else int(size),
        "n": int(n),
        "keys": sorted(keys),
    }


def build_device_cache(data_module, mesh: Mesh, batch_size: int,
                       seed: int = 0,
                       keys: Sequence[str] = ("image", "joints",
                                              "joints_vis"),
                       disk_cache: bool = True) -> DeviceDataCache:
    """Decode every train instance once through the data module's loader
    (native C++ JPEG path when built) and upload the stacked arrays.
    ``keys`` selects the per-kind batch fields (SBP/PIS: image/joints/
    joints_vis; SPM: image/joints/centers).

    Loads with val semantics (no shuffle, no host CLAHE, no drop_last):
    the crop is deterministic, and randomized CLAHE moves on device
    (ops/image.py::clahe_luma) where it can re-draw per epoch -- host
    CLAHE baked into a cache would freeze one draw for the whole run.

    Because the decoded product is deterministic, it is also memoized on
    disk (``<train_path>.devcache/``, one .npy per key + meta.json keyed
    on the annotation file's mtime/size and the crop size): re-runs skip
    the ~1-core JPEG decode pass (minutes at 10k instances) and stream
    straight from disk to HBM.
    """
    cache_dir = _disk_cache_dir(data_module, keys) if disk_cache else None
    n_db = len(data_module.train_db)
    if cache_dir and os.path.exists(os.path.join(cache_dir, "meta.json")):
        try:
            with open(os.path.join(cache_dir, "meta.json")) as f:
                meta = json.load(f)
            if meta == _disk_cache_meta(data_module, keys, n_db):
                arrays = {k: np.load(os.path.join(cache_dir, k + ".npy"))
                          for k in keys}
                return DeviceDataCache(mesh, arrays, batch_size, seed=seed)
        except (OSError, ValueError, KeyError):
            pass  # unreadable/stale cache: fall through to re-decode

    loader = data_module._loader(data_module.train_db, train=False,
                                 batch_size=batch_size)
    parts: Dict[str, list] = {k: [] for k in keys}
    for batch in loader:
        for k in keys:
            parts[k].append(batch[k])
    arrays = {k: np.concatenate(parts[k], axis=0) for k in keys}

    if cache_dir:
        try:
            tmp = cache_dir + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            for k in keys:
                np.save(os.path.join(tmp, k + ".npy"), arrays[k])
            meta = _disk_cache_meta(data_module, keys,
                                    len(arrays[keys[0]]))
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump(meta, f)
            if os.path.exists(cache_dir):
                import shutil

                shutil.rmtree(cache_dir)
            os.replace(tmp, cache_dir)
        except OSError as e:
            print(f"devcache: disk memoization skipped ({e})")
    return DeviceDataCache(mesh, arrays, batch_size, seed=seed)
