"""Frozen-subtree optimizer mask (the freeze helper equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_pose_estimation_tpu.optim import (build_optimizer_from_cfg,
                                               freeze_subtrees,
                                               get_optimizer)


def test_freeze_subtrees_blocks_updates():
    params = {"backbone": {"w": jnp.ones((3,))},
              "head": {"w": jnp.ones((3,))}}
    opt = freeze_subtrees(get_optimizer("sgd", lr=0.1, momentum=0.9),
                          ["backbone"])
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["backbone"]["w"]), 0.0)
    assert float(jnp.abs(updates["head"]["w"]).sum()) > 0


def test_freeze_from_cfg():
    cfg = {"optimizer": "sgd",
           "optimizer_options": {"lr": 0.1},
           "freeze": ["backbone"]}
    opt, _ = build_optimizer_from_cfg(cfg)
    params = {"backbone": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
    state = opt.init(params)
    updates, _ = opt.update(jax.tree_util.tree_map(jnp.ones_like, params),
                            state, params)
    np.testing.assert_array_equal(np.asarray(updates["backbone"]["w"]), 0.0)
