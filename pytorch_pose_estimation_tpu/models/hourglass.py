"""Stacked-hourglass building blocks.

The reference carries these as unused scaffolding for a future hourglass
backbone (reference: models/layers/blocks.py:8-86 -- Conv/Residual/
recursive Hourglass, never imported by the main path).  Provided here as
working flax modules for the same future use: a pre-activation residual
bottleneck and the classic recursive hourglass (pool -> recurse -> upsample
+ skip).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, max_pool_2x2


class Residual(nn.Module):
    """Bottleneck residual: BN-ReLU-1x1 -> BN-ReLU-3x3 -> BN-ReLU-1x1 with
    a 1x1 skip when channel counts differ."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = max(self.features // 2, 1)
        y = ConvBnRelu(half, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBnRelu(half, 3, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBnRelu(self.features, 1, dtype=self.dtype, name="conv3")(
            y, train)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="skip")(x)
        return x + y


class Hourglass(nn.Module):
    """Recursive hourglass of depth n: up-branch residual + (pool ->
    inner hourglass/residual -> 2x nearest upsample) low-branch, summed."""

    depth: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        up = Residual(self.features, dtype=self.dtype, name="up")(x, train)
        low = max_pool_2x2(x)
        low = Residual(self.features, dtype=self.dtype, name="low1")(
            low, train)
        if self.depth > 1:
            low = Hourglass(self.depth - 1, self.features, dtype=self.dtype,
                            name="inner")(low, train)
        else:
            low = Residual(self.features, dtype=self.dtype, name="low2")(
                low, train)
        low = Residual(self.features, dtype=self.dtype, name="low3")(
            low, train)
        b, h, w, c = low.shape
        low = jax.image.resize(low, (b, h * 2, w * 2, c), method="nearest")
        return up + low
