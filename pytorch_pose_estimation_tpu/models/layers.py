"""Layer primitives (conv->BN->act blocks).

TPU-native re-design of the reference primitives
(reference: models/layers/conv_block.py:4-53):

* NHWC layout throughout -- XLA:TPU's native convolution layout, so the
  channel dim rides the 128-lane axis and convs tile straight onto the MXU.
* "same" padding for odd kernels = (k-1)//2 on each side, identical to the
  reference's explicit padding arithmetic.
* conv bias is disabled (BN makes it redundant), matching the reference.
* Params are stored fp32; compute dtype is configurable (bfloat16 on TPU for
  MXU throughput).  BN statistics/normalization always run in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBnAct(nn.Module):
    """conv (no bias) -> BatchNorm -> activation.

    BN matches torch defaults: eps=1e-5, running-stat momentum 0.1
    (flax momentum = 0.9).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x.astype(self.dtype)


def ConvBnRelu(features: int, kernel_size: int = 3, strides: int = 1,
               dtype: Dtype = jnp.float32, **kw) -> ConvBnAct:
    """conv->BN->ReLU (reference: models/layers/conv_block.py:4)."""
    return ConvBnAct(features=features, kernel_size=kernel_size,
                     strides=strides, activation=nn.relu, dtype=dtype, **kw)


def ConvBn(features: int, kernel_size: int = 3, strides: int = 1,
           dtype: Dtype = jnp.float32, **kw) -> ConvBnAct:
    """conv->BN, no activation (reference: models/layers/conv_block.py:41)."""
    return ConvBnAct(features=features, kernel_size=kernel_size,
                     strides=strides, activation=None, dtype=dtype, **kw)


class DeconvBnRelu(nn.Module):
    """ConvTranspose(k=4, s=2, p=1, no bias) -> BN -> ReLU: exact 2x upsample.

    Matches the reference's deconv stages (reference: models/detector/sbp.py:17-33).
    ``transpose_kernel=True`` makes flax's ConvTranspose the exact adjoint of a
    strided Conv, which is what torch's ConvTranspose2d computes -- this keeps
    imported torch checkpoints numerically exact (verified in
    tests/test_models.py).  The torch (k=4, s=2, p=1) geometry corresponds to
    ((2, 2), (2, 2)) low/high padding in the fractionally-strided view.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.ConvTranspose(
            features=self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding=((2, 2), (2, 2)),
            transpose_kernel=True,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="deconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool ('M' entries in the backbone table)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
