"""Functional train state: params + BN batch statistics + optimizer state.

Replaces the reference's Lightning module state (module/sbp_detector.py) --
the whole training step is a pure function of (state, batch, rng) so it
jits once and shards transparently over the mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=batch_stats,
                            opt_state=new_opt_state)


def create_train_state(model, optimizer, input_shape, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        apply_fn=model.apply,
        tx=optimizer,
    )
