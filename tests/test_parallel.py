"""Mesh/sharding layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_pose_estimation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    select_devices,
    shard_host_batch,
)


def test_select_devices():
    assert len(select_devices("auto")) == 8
    assert len(select_devices(None)) == 8
    assert len(select_devices(2)) == 2
    assert len(select_devices([0, 3])) == 2


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_shard_host_batch_places_batch_dim():
    mesh = make_mesh()
    batch = {
        "image": np.zeros((16, 8, 8, 3), np.uint8),
        "joints": np.zeros((16, 17, 2), np.float32),
        "paths": ["x"] * 16,
    }
    dev = shard_host_batch(batch, mesh)
    assert dev["paths"] == ["x"] * 16  # non-arrays untouched
    # batch dim split 8 ways -> each shard holds 2 rows
    shard_shapes = {s.data.shape for s in dev["image"].addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_grad_allreduce_inserted_by_gspmd():
    """A data-sharded loss gradient must equal the global-batch gradient
    (i.e. XLA all-reduced across the 8 shards)."""
    mesh = make_mesh()
    w = jax.device_put(jnp.ones((4,)), replicated_sharding(mesh))
    x = np.random.RandomState(0).randn(16, 4).astype(np.float32)
    y = np.random.RandomState(1).randn(16).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    ys = jax.device_put(jnp.asarray(y), batch_sharding(mesh))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(w, xs, ys)
    g_local = jax.grad(loss)(jnp.ones((4,)), jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local),
                               rtol=1e-6)


def test_sharded_batch_matches_single_device_forward():
    """A tiny conv-BN net gives identical results whether the batch is on
    one device or sharded across 8 (sync-BN semantics under GSPMD)."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            return nn.relu(x)

    model = Tiny()
    x = np.random.RandomState(0).rand(8, 8, 8, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = model.apply(variables, jnp.asarray(x))

    mesh = make_mesh()
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    vs = jax.device_put(variables, replicated_sharding(mesh))
    out = jax.jit(lambda v, x: model.apply(v, x))(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spatial_sharding_conv_forward():
    """Sharding the HEIGHT dim across the mesh must give identical results:
    GSPMD inserts the conv halo exchanges. This is the large-input scaling
    axis for SPM 512^2+ inputs (batch=1 inference can use all chips).

    Uses a compact conv+pool+deconv stack rather than the full SBP model:
    the property (halo-exchange exactness through conv, maxpool, and
    conv-transpose) is identical, but a full darknet19 partitioned 8-ways
    in H makes this 1-core host's virtual devices miss XLA's collective
    rendezvous deadline (observed SIGABRT), and compiles for minutes."""
    from flax import linen as nn
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_pose_estimation_tpu.models.layers import (ConvBnRelu,
                                                            DeconvBnRelu)

    class SpatialStack(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBnRelu(8, 3)(x, train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBnRelu(16, 3)(x, train)
            x = DeconvBnRelu(8)(x, train)
            return ConvBnRelu(4, 1)(x, train)

    model = SpatialStack()
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = model.apply(variables, jnp.asarray(x))

    mesh = make_mesh()
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "data")))
    vs = jax.device_put(variables, replicated_sharding(mesh))
    out = jax.jit(lambda v, x: model.apply(v, x))(vs, xs)
    # height dim of the input is split 8 ways
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 8, 64, 3)}
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_train_step_8dev_mesh_matches_single_device():
    """THE multi-chip correctness contract (reference: train_sbp.py:74 DDP
    gradient equivalence): one full jitted train step -- augmentation,
    target gen, forward, loss, backward, optimizer update, BN batch-stat
    update -- from identical state and batch must produce the same params,
    opt state, and batch stats whether the batch lives on 1 device or is
    sharded across the 8-device mesh (GSPMD grad all-reduce + sync-BN)."""
    from flax import linen as nn

    from pytorch_pose_estimation_tpu.optim import get_optimizer
    from pytorch_pose_estimation_tpu.train import create_train_state
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    class TinyStride4(nn.Module):
        """Stride-4 stand-in for SBP (same train-step contract, small
        enough to partition-compile on the CPU test mesh)."""
        num_keypoints: int = 3

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False,
                        name="c1")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), strides=(2, 2), use_bias=False,
                        name="c2")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
            x = nn.relu(x)
            return nn.Conv(self.num_keypoints, (1, 1), use_bias=False,
                           name="head")(x)

    batch_size, size, k = 16, 32, 3
    model = TinyStride4(num_keypoints=k)
    optimizer = get_optimizer("sgd", lr=1e-2, momentum=0.9,
                              weight_decay=5e-3, nesterov=True)
    train_step, _ = make_sbp_steps(model, optimizer, (size, size),
                                   (size // 4, size // 4), k, sigma=1.0)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (batch_size, size, size, 3),
                             np.uint8),
        "joints": rng.uniform(2, size - 2,
                              (batch_size, k, 2)).astype(np.float32),
        "joints_vis": np.ones((batch_size, k), np.float32),
    }
    step_rng = jax.random.PRNGKey(42)

    def run(state, put):
        # deep-copy: train_step donates its state argument, and the
        # caller's ``state0`` is reused by the second run
        s = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                   state)
        b = {kk: put(jnp.asarray(v)) for kk, v in batch.items()}
        for i in range(2):  # 2 steps: momentum buffers enter step 2
            s, loss = train_step(s, b, jax.random.fold_in(step_rng, i))
        return s, float(loss)

    state0 = create_train_state(model, optimizer, (1, size, size, 3))

    ref_state, ref_loss = run(state0, lambda x: x)

    mesh = make_mesh()
    state_r = jax.device_put(state0, replicated_sharding(mesh))
    sh_state, sh_loss = run(state_r, lambda x: jax.device_put(
        x, batch_sharding(mesh)))

    np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-5)
    for name, ref_tree, got_tree in (
            ("params", ref_state.params, sh_state.params),
            ("batch_stats", ref_state.batch_stats, sh_state.batch_stats),
            ("opt_state", ref_state.opt_state, sh_state.opt_state)):
        ref_leaves = jax.tree_util.tree_leaves(ref_tree)
        got_leaves = jax.tree_util.tree_leaves(got_tree)
        assert len(ref_leaves) == len(got_leaves) and ref_leaves
        for r, g in zip(ref_leaves, got_leaves):
            # atol 1e-5: the global-batch reductions (loss sums, BN
            # moments, grad all-reduce) run in a different order when
            # sharded, so tiny momentum-buffer entries drift a few ulp
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=1e-5,
                err_msg=name)
