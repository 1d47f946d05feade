"""Darknet19 backbone, table-driven (reference: models/backbone/darknet.py:46-150).

The stage table is the YOLO Darknet19 architecture: a stem conv plus five
stages, each starting with a 2x2 max-pool ('M') and alternating 3x3 / 1x1
convs.  Total stride 32: a 256x192 input leaves layer5 as an 8x6x1024 map.

TPU-native differences from the reference:
* NHWC + jit; stages are unrolled Python loops over a static table, so XLA
  sees one flat graph and fuses BN/ReLU into the convolutions.
* ``features_only`` / ``out_indices`` select intermediate feature maps the
  same way the reference's FeatureListNet does
  (reference: models/backbone/darknet.py:15-43).
* The ImageNet-style classifier head (Dropout2d(0.5) + 1x1 conv +
  global-avg-pool) is built only when ``features_only=False``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, max_pool_2x2

# Stage tables: 'M' = 2x2/2 max-pool; (channels, kernel) = ConvBnRelu.
STEM = ((32, 3),)
LAYER1 = ("M", (64, 3))
LAYER2 = ("M", (128, 3), (64, 1), (128, 3))
LAYER3 = ("M", (256, 3), (128, 1), (256, 3))
LAYER4 = ("M", (512, 3), (256, 1), (512, 3), (256, 1), (512, 3))
LAYER5 = ("M", (1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3))

STAGES = (STEM, LAYER1, LAYER2, LAYER3, LAYER4, LAYER5)
STAGE_NAMES = ("stem", "layer1", "layer2", "layer3", "layer4", "layer5")


class _Stage(nn.Module):
    """One backbone stage driven by a static table row."""

    table: Tuple[Union[str, Tuple[int, int]], ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_idx = 0
        for entry in self.table:
            if entry == "M":
                x = max_pool_2x2(x)
            else:
                ch, k = entry
                x = ConvBnRelu(ch, k, dtype=self.dtype, name=f"conv{conv_idx}")(
                    x, train=train
                )
                conv_idx += 1
        return x


class Darknet19(nn.Module):
    """Darknet19: feature extractor and/or classifier.

    Args:
      num_classes: classifier width (1000 ImageNet / 200 tiny-imagenet).
      features_only: return feature map(s) instead of logits.
      out_indices: stage indices (0=stem .. 5=layer5) to return when
        ``features_only``; None returns only the final (layer5) map.
    """

    num_classes: int = 1000
    features_only: bool = False
    out_indices: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = []
        for name, table in zip(STAGE_NAMES, STAGES):
            x = _Stage(table=table, dtype=self.dtype, name=name)(x, train=train)
            feats.append(x)

        if self.features_only:
            if self.out_indices is None:
                return feats[-1]
            return [feats[i] for i in self.out_indices]

        # Classifier head: Dropout2d(0.5) -> 1x1 ConvBnRelu -> GAP -> flatten.
        x = nn.Dropout(rate=0.5, deterministic=not train, name="dropout")(x)
        x = ConvBnRelu(self.num_classes, 1, dtype=self.dtype, name="classifier")(
            x, train=train
        )
        x = jnp.mean(x, axis=(1, 2))  # global average pool over H, W
        return x


def darknet19(
    pretrained: str = "",
    features_only: bool = False,
    out_indices: Optional[Sequence[int]] = None,
    num_classes: int = 1000,
    dtype: Any = jnp.float32,
    **kwargs,
) -> Darknet19:
    """Factory mirroring the reference's ``darknet19`` entry point
    (reference: models/backbone/darknet.py:134-161).

    ``pretrained='tiny-imagenet'`` selects the 200-class variant; actual
    checkpoint loading is a separate explicit step in this framework
    (train.checkpoint.load_backbone / models.torch_import) rather than a
    filesystem side effect at construction time.
    """
    if pretrained == "tiny-imagenet":
        num_classes = 200
    return Darknet19(
        num_classes=num_classes,
        features_only=features_only,
        out_indices=tuple(out_indices) if out_indices is not None else None,
        dtype=dtype,
    )
