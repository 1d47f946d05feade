"""Shared model/batch builders for the real multi-host test
(tests/test_multihost.py) and its subprocess workers.

Kept in a module (not inline in the worker source) so the 2-process
distributed run and the in-process single-device reference are guaranteed
to build byte-identical models, steps, and batches.
"""

import numpy as np

GLOBAL_BATCH = 8
SIZE = 32
K = 3


def build_model_and_step():
    from flax import linen as nn

    from pytorch_pose_estimation_tpu.optim import get_optimizer
    from pytorch_pose_estimation_tpu.train.steps import make_sbp_steps

    class TinyStride4(nn.Module):
        """Stride-4 SBP stand-in (same contract as tests/test_parallel.py)
        small enough to partition-compile on CPU in seconds."""

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
            return nn.Conv(K, (1, 1), use_bias=False, name="head")(x)

    model = TinyStride4()
    optimizer = get_optimizer("sgd", lr=1e-2, momentum=0.9,
                              weight_decay=5e-3, nesterov=True)
    train_step, _ = make_sbp_steps(model, optimizer, (SIZE, SIZE),
                                   (SIZE // 4, SIZE // 4), K, sigma=1.0)
    return model, optimizer, train_step


def make_global_batch():
    rng = np.random.RandomState(0)
    return {
        "image": rng.randint(0, 255, (GLOBAL_BATCH, SIZE, SIZE, 3),
                             np.uint8),
        "joints": rng.uniform(2, SIZE - 2,
                              (GLOBAL_BATCH, K, 2)).astype(np.float32),
        "joints_vis": np.ones((GLOBAL_BATCH, K), np.float32),
    }


def run_steps(train_step, state, put_batch, n_steps=2):
    import jax

    batch = {k: put_batch(v) for k, v in make_global_batch().items()}
    key = jax.random.PRNGKey(42)
    loss = None
    for i in range(n_steps):
        state, loss = train_step(state, batch, jax.random.fold_in(key, i))
    return state, float(loss)


def flat_leaves(tree):
    import jax

    return [np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(tree)]
