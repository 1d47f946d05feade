"""SBP detector: Simple Baselines for Human Pose Estimation.

Reference: models/detector/sbp.py:10-49.  darknet19 features (1024ch,
stride 32) -> 3x [ConvTranspose k4 s2 p1 -> BN -> ReLU] (1024->512,
512->512, 512->512; stride 32 -> 4) -> 1x1 conv (no bias) to
``num_keypoints`` logit heatmaps.  The sigmoid lives in the loss/decode,
not the model, exactly as in the reference.

Shape ladder at 256x192 input: 8x6x1024 -> 16x12 -> 32x24 -> 64x48x512
-> 64x48xK.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .darknet import Darknet19
from .layers import DeconvBnRelu


class SBP(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32
    # rematerialize the backbone on the backward pass: trades ~30% more
    # FLOPs for dropping all backbone activations from HBM -- the
    # jax.checkpoint lever for very large per-chip batches
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, H, W, 3] -> logits [B, H/4, W/4, num_keypoints]."""
        backbone_cls = nn.remat(Darknet19, static_argnums=(2,)) if self.remat \
            else Darknet19
        x = backbone_cls(features_only=True, dtype=self.dtype,
                         name="backbone")(x, train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_1")(x, train=train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_2")(x, train=train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_3")(x, train=train)
        x = nn.Conv(
            features=self.num_keypoints,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="head",
        )(x)
        # Heatmap logits stay fp32 so loss/decode match reference numerics.
        return x.astype(jnp.float32)
