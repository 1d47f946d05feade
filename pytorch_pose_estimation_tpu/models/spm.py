"""SPM detector: Single-Stage Multi-Person Pose Machines.

Reference: models/detector/spm.py:11-50.  Identical trunk to SBP; the head
emits ``1 + 2*num_keypoints`` channels: channel 0 is the root-joint heatmap
logit, channels 1..2K are x/y displacement-field logits per keypoint
(sigmoid/tanh applied in the loss/decode, not here).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .darknet import Darknet19
from .layers import DeconvBnRelu


class SPM(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32
    remat: bool = False  # see models/sbp.py

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, H, W, 3] -> logits [B, H/4, W/4, 1 + 2*num_keypoints]."""
        backbone_cls = nn.remat(Darknet19, static_argnums=(2,)) if self.remat \
            else Darknet19
        x = backbone_cls(features_only=True, dtype=self.dtype,
                         name="backbone")(x, train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_1")(x, train=train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_2")(x, train=train)
        x = DeconvBnRelu(512, dtype=self.dtype, name="deconv_3")(x, train=train)
        x = nn.Conv(
            features=1 + 2 * self.num_keypoints,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="head",
        )(x)
        return x.astype(jnp.float32)
