"""Explicit weight initialization (reference: models/initialize.py:4-16 --
Xavier-uniform conv, ones/zeros BN, N(0, 0.01) dense; defined but commented
out at the reference's call site, models/backbone/darknet.py:154).

Applied functionally: transform an initialized param pytree instead of
mutating modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_initialize(params, rng=None):
    """Re-draw a flax param tree with the reference's scheme.

    Conv/ConvTranspose kernels (4-D leaves named 'kernel'): Xavier uniform.
    BN 'scale' -> 1, 'bias' -> 0.  2-D 'kernel' leaves (dense): N(0, 0.01).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))

    leaves = []
    for (path, leaf), key in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim == 4:
            # Xavier uniform over (fan_in, fan_out) of an HWIO kernel
            rf = leaf.shape[0] * leaf.shape[1]
            fan_in, fan_out = rf * leaf.shape[2], rf * leaf.shape[3]
            limit = jnp.sqrt(6.0 / (fan_in + fan_out))
            leaves.append(jax.random.uniform(
                key, leaf.shape, leaf.dtype, -limit, limit))
        elif name == "kernel" and leaf.ndim == 2:
            leaves.append(0.01 * jax.random.normal(key, leaf.shape,
                                                   leaf.dtype))
        elif name == "scale":
            leaves.append(jnp.ones_like(leaf))
        elif name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
