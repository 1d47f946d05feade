"""DeviceDataCache: on-device batch gather over the 8-device virtual mesh.

The cache replaces the per-step host feed (see train/device_cache.py);
these tests pin its contract: every batch row is a real dataset row, an
epoch covers each shard-resident instance exactly once (drop_last aside),
padding wraps around, gathers stay shard-local, and epochs reshuffle
deterministically by seed.
"""

import jax
import numpy as np
import pytest

from pytorch_pose_estimation_tpu.parallel.mesh import make_mesh
from pytorch_pose_estimation_tpu.train.device_cache import DeviceDataCache


def _arrays(n, h=4, w=3):
    # image[i] encodes the row id so gathered batches are attributable
    image = np.zeros((n, h, w, 3), np.uint8)
    image[:, 0, 0, 0] = np.arange(n) % 256
    joints = np.arange(n, dtype=np.float32)[:, None, None].repeat(
        5, 1).repeat(2, 2)
    vis = np.ones((n, 5), np.float32)
    return {"image": image, "joints": joints, "joints_vis": vis}


def test_gather_rows_match_source():
    mesh = make_mesh(jax.devices()[:8])
    n = 64
    cache = DeviceDataCache(mesh, _arrays(n), batch_size=16, seed=0)
    assert cache.steps_per_epoch == 64 // 16
    seen = []
    for batch in cache.epoch_batches(0):
        img = np.asarray(batch["image"])
        joints = np.asarray(batch["joints"])
        assert img.shape == (16, 4, 3, 3)
        rows = img[:, 0, 0, 0].astype(np.int64)
        # every key gathered the SAME rows
        np.testing.assert_array_equal(joints[:, 0, 0].astype(np.int64), rows)
        seen.extend(rows.tolist())
    # one epoch = every instance exactly once (n divisible by batch & mesh)
    assert sorted(seen) == list(range(n))


def test_padding_wraparound_and_coverage():
    mesh = make_mesh(jax.devices()[:8])
    n = 10  # pads to 16: 6 wraparound duplicates, n_local = 2
    cache = DeviceDataCache(mesh, _arrays(n), batch_size=8, seed=3)
    assert cache.n_total == 16 and cache.n_local == 2
    seen = []
    for batch in cache.epoch_batches(0):
        seen.extend(np.asarray(batch["image"])[:, 0, 0, 0].tolist())
    assert len(seen) == 16
    assert set(seen) <= set(range(n))        # only real rows
    assert len(set(seen)) == n               # every row appears


def test_epoch_shuffle_deterministic_and_varied():
    mesh = make_mesh(jax.devices()[:8])
    cache = DeviceDataCache(mesh, _arrays(64), batch_size=32, seed=1)

    def epoch_rows(e):
        return [np.asarray(b["image"])[:, 0, 0, 0].tolist()
                for b in cache.epoch_batches(e)]

    assert epoch_rows(0) == epoch_rows(0)    # same epoch -> same order
    assert epoch_rows(0) != epoch_rows(1)    # epochs reshuffle
    # a fresh cache with the same seed reproduces the same stream
    cache2 = DeviceDataCache(mesh, _arrays(64), batch_size=32, seed=1)
    assert epoch_rows(5) == [
        np.asarray(b["image"])[:, 0, 0, 0].tolist()
        for b in cache2.epoch_batches(5)]


def test_batches_sharded_over_mesh():
    mesh = make_mesh(jax.devices()[:8])
    cache = DeviceDataCache(mesh, _arrays(32), batch_size=16, seed=0)
    batch = next(iter(cache.epoch_batches(0)))
    shardings = {k: v.sharding for k, v in batch.items()}
    for k, s in shardings.items():
        assert s.is_equivalent_to(cache._idx_sharding, batch[k].ndim), k
    # shard-local gather: each device's shard holds 2 of the 16 rows
    assert len(batch["image"].addressable_shards) == 8
    assert batch["image"].addressable_shards[0].data.shape[0] == 2


def test_validation_errors():
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError):
        DeviceDataCache(mesh, _arrays(32), batch_size=12, seed=0)  # % 8
    with pytest.raises(ValueError):  # per-device batch > shard
        DeviceDataCache(mesh, _arrays(8), batch_size=64, seed=0)


def test_epoch_runner_matches_per_step_path():
    """make_epoch_runner (one lax.scan dispatch per epoch, gather folded
    into the scanned step) must produce the SAME parameter trajectory and
    per-step losses as dispatching Trainer.fit's per-step loop by hand:
    same epoch index draws, same ``rng, step_key = split(rng)`` sequence.
    Also: stacking two epochs into one runner call == two runner calls."""
    from flax import linen as nn

    from pytorch_pose_estimation_tpu.optim import get_optimizer
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    class Tiny(nn.Module):
        num_keypoints: int = 3

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return nn.Conv(self.num_keypoints, (1, 1), use_bias=False)(x)

    size, k, n, batch = 32, 3, 32, 16
    mesh = make_mesh(jax.devices()[:8])
    rng_np = np.random.RandomState(0)
    arrays = {
        "image": rng_np.randint(0, 255, (n, size, size, 3), np.uint8),
        "joints": rng_np.uniform(2, size - 2, (n, k, 2)).astype(np.float32),
        "joints_vis": np.ones((n, k), np.float32),
    }
    cache = DeviceDataCache(mesh, arrays, batch_size=batch, seed=7)
    assert cache.steps_per_epoch == 2

    model = Tiny(num_keypoints=k)
    optimizer = get_optimizer("sgd", lr=1e-2, momentum=0.9,
                              weight_decay=5e-3, nesterov=True)
    train_step, _ = make_sbp_steps(model, optimizer, (size, size),
                                   (size // 4, size // 4), k, sigma=1.0)
    state0 = create_train_state(model, optimizer, (1, size, size, 3))

    def fresh():
        import jax.numpy as jnp
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      state0)

    # --- reference trajectory: per-step dispatch, Trainer.fit discipline
    state = fresh()
    rng = jax.random.PRNGKey(5)
    ref_losses = []
    for epoch in range(2):
        for b in cache.epoch_batches(epoch):
            rng, step_key = jax.random.split(rng)
            state, loss = train_step(state, b, step_key)
            ref_losses.append(float(loss))
    ref_params = jax.tree_util.tree_leaves(state.params)

    # --- one runner call per epoch
    runner = cache.make_epoch_runner(train_step)
    state = fresh()
    rng = jax.random.PRNGKey(5)
    got_losses = []
    for epoch in range(2):
        state, rng, losses = runner(state, rng, [epoch])
        got_losses.extend(np.asarray(losses).tolist())
    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-6)
    for r, g in zip(ref_params, jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)

    # --- both epochs stacked into ONE dispatch
    state, rng2, losses = runner(fresh(), jax.random.PRNGKey(5), [0, 1])
    np.testing.assert_allclose(np.asarray(losses).tolist(), ref_losses,
                               rtol=1e-6)
    for r, g in zip(ref_params, jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)

    # --- chunk_steps bounds the per-dispatch scan length (the TPU-worker
    # watchdog fix for long epochs, e.g. SPM-512): a 3+1-step split of the
    # same 4 steps must carry state/rng across chunks bit-identically
    chunked = cache.make_epoch_runner(train_step, chunk_steps=3)
    state, rng3, losses = chunked(fresh(), jax.random.PRNGKey(5), [0, 1])
    np.testing.assert_allclose(np.asarray(losses).tolist(), ref_losses,
                               rtol=1e-6)
    for r, g in zip(ref_params, jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rng3), np.asarray(rng2))


def test_disk_memoization_roundtrip(tmp_path):
    """build_device_cache memoizes the decoded arrays on disk and the
    second build loads byte-identical data without touching the loader;
    editing the annotation file invalidates the cache."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synth_fixture import make_dataset

    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
    from pytorch_pose_estimation_tpu.train.device_cache import \
        build_device_cache

    root = str(tmp_path / "coco")
    make_dataset(root, "train2017", 8, seed=3)
    ann = os.path.join(root, "annotations",
                       "person_keypoints_train2017.json")
    dm = SBPCOCODataModule(
        train_path=ann, val_path=None, img_dir=root,
        input_size=(64, 48), output_size=(16, 12), num_keypoints=17,
        sigma=2.0, workers=0, batch_size=8, class_labels=[])
    dm.setup()
    mesh = make_mesh(jax.devices()[:8])

    c1 = build_device_cache(dm, mesh, batch_size=8, seed=0)
    cache_dir = ann + ".devcache"
    assert os.path.exists(os.path.join(cache_dir, "meta.json"))
    assert os.path.exists(os.path.join(cache_dir, "image.npy"))

    # second build must hit the disk cache: break the loader to prove it
    dm2 = SBPCOCODataModule(
        train_path=ann, val_path=None, img_dir=root,
        input_size=(64, 48), output_size=(16, 12), num_keypoints=17,
        sigma=2.0, workers=0, batch_size=8, class_labels=[])
    dm2.setup()
    dm2._loader = None  # would raise if the decode path were taken
    c2 = build_device_cache(dm2, mesh, batch_size=8, seed=0)
    b1 = next(iter(c1.epoch_batches(0)))
    b2 = next(iter(c2.epoch_batches(0)))
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))

    # invalidation: touching the annotation file re-decodes
    with open(ann, "a") as f:
        f.write(" ")
    dm2._loader = dm.__class__._loader.__get__(dm2)
    c3 = build_device_cache(dm2, mesh, batch_size=8, seed=0)
    assert c3.n_total == c1.n_total


def test_trainer_cache_scan_false_matches_scan(tmp_path, monkeypatch):
    """Trainer.fit with ``cache_scan: false`` (HBM cache fed through
    per-step dispatches, the fallback for graphs whose whole-epoch scan
    is pathological) must land on the same parameters as the default
    epoch-scan runner.  Uses a tiny stand-in model so the equivalence of
    the Trainer *wiring* (rng discipline, step counters, loss logging)
    is tested without a multi-minute full-SBP CPU compile."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from flax import linen as nn
    from synth_fixture import make_dataset

    from pytorch_pose_estimation_tpu.data import SBPCOCODataModule
    from pytorch_pose_estimation_tpu.train import trainer as trainer_mod

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return nn.Conv(17, (1, 1), use_bias=False)(x)

    monkeypatch.setattr(trainer_mod, "build_model",
                        lambda cfg, kind: Tiny())

    root = str(tmp_path / "coco")
    make_dataset(root, "train2017", 16, seed=3)
    ann = os.path.join(root, "annotations",
                       "person_keypoints_train2017.json")
    cfg = {
        "model": "simple-baselines-pose", "dataset_name": "t",
        "num_keypoints": 17, "sigma": 1.0, "conf_threshold": 0.25,
        "input_size": [32, 32], "output_size": [8, 8],
        "train_path": ann, "val_path": None, "img_dir": root,
        "batch_size": 8, "workers": 0, "epochs": 2, "seed": 11,
        "devices": 8, "precision": "fp32", "cache_device": True,
        "optimizer": "sgd",
        "optimizer_options": {"lr": 1e-2, "momentum": 0.9,
                              "weight_decay": 5e-3, "nesterov": True},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 2, "steps": [100],
                              "scales": [0.1]},
    }

    def run(**over):
        dm = SBPCOCODataModule(
            train_path=ann, val_path=None, img_dir=root,
            input_size=(32, 32), output_size=(8, 8), num_keypoints=17,
            sigma=1.0, workers=0, batch_size=8, class_labels=[])
        dm.setup()
        tr = trainer_mod.Trainer(dict(cfg, **over), dm, kind="sbp",
                                 logging=False)
        return tr.fit()

    s_scan = run(cache_scan=True)
    s_step = run(cache_scan=False)
    s_chunk = run(cache_scan=True, scan_steps_per_dispatch=1)
    assert int(s_scan.step) == int(s_step.step) == int(s_chunk.step) > 0
    for name, other in (("per-step", s_step), ("chunked", s_chunk)):
        for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                        jax.tree_util.tree_leaves(other.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=name)
