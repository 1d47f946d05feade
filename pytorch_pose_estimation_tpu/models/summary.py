"""Model summary printing (replaces the reference's torchinfo.summary call
at train_sbp.py:48): parameter counts per top-level module plus total,
and the output shape for a given input shape.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def summarize(model, input_shape: Tuple[int, ...], rng=None) -> Dict[str, Any]:
    """Init the model abstractly and return a summary dict (also printable)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = jax.eval_shape(lambda: model.init(rng, x))
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    out = jax.eval_shape(
        lambda v: model.apply(v, x),
        variables,
    )

    per_module = {k: count_params(v) for k, v in params.items()}
    info = {
        "input_shape": tuple(input_shape),
        "output_shape": tuple(jax.tree_util.tree_leaves(out)[0].shape),
        "params_per_module": per_module,
        "total_params": count_params(params),
        "batch_stats": count_params(batch_stats),
    }
    return info


def print_summary(model, input_shape: Tuple[int, ...]) -> Dict[str, Any]:
    info = summarize(model, input_shape)
    width = max((len(k) for k in info["params_per_module"]), default=10) + 2
    print("=" * (width + 20))
    print(f"{'Module':<{width}}{'Params':>14}")
    print("-" * (width + 20))
    for name, n in info["params_per_module"].items():
        print(f"{name:<{width}}{n:>14,}")
    print("-" * (width + 20))
    print(f"{'Total trainable':<{width}}{info['total_params']:>14,}")
    print(f"{'BN running stats':<{width}}{info['batch_stats']:>14,}")
    print(f"Input  shape: {info['input_shape']}")
    print(f"Output shape: {info['output_shape']}")
    print("=" * (width + 20))
    return info
