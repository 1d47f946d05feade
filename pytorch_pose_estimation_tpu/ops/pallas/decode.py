"""Pallas TPU kernel: fused batched SBP heatmap decode.

Replaces the reference's per-keypoint Python decode loop
(reference: utils/sbp_utils.py:56-82) with one kernel that fuses
sigmoid -> per-channel max -> first-occurrence argmax -> threshold test
per sample, keeping the [K, H, W] maps in VMEM and writing only K×3
floats (in a 128-lane padded row) back to HBM per sample.

Semantics identical to ops.decode.decode_sbp_batch: strict > threshold,
row-major first-occurrence argmax, (-1, -1, -1) sentinel scaled like the
reference scales it.

Mosaic notes: every intermediate stays >= 2D with a 128-wide lane dim
(narrow [K, 3] vectors crash layout inference on this toolchain), and the
(x, y, conf) row is assembled with lane-index selects instead of
concatenation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _decode_kernel(maps_ref, out_ref, *, conf_threshold: float,
                   apply_sigmoid: bool, scale: float, h: int, w: int):
    maps = maps_ref[0]                                      # [K, H, W]
    if apply_sigmoid:
        maps = jax.nn.sigmoid(maps)
    k = maps.shape[0]

    conf3 = jnp.max(maps, axis=2, keepdims=True)            # [K, H, 1]
    conf3 = jnp.max(conf3, axis=1, keepdims=True)           # [K, 1, 1]
    lin = (jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 1) * w
           + jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 2))
    is_max = maps >= conf3
    masked = jnp.where(is_max, lin, h * w)
    idx3 = jnp.min(masked, axis=2, keepdims=True)
    idx3 = jnp.min(idx3, axis=1, keepdims=True)             # [K, 1, 1]

    conf = jnp.broadcast_to(conf3[:, 0, :], (k, _LANES))    # [K, LANES]
    idx = jnp.broadcast_to(idx3[:, 0, :], (k, _LANES))
    x = (idx % w).astype(jnp.float32) * scale
    y = (idx // w).astype(jnp.float32) * scale
    found = conf > conf_threshold

    lane = jax.lax.broadcasted_iota(jnp.int32, (k, _LANES), 1)
    row = jnp.where(lane == 0, x, jnp.where(lane == 1, y, conf))
    # reference scales the (-1, -1) sentinels too (utils/sbp_utils.py:116)
    sentinel = jnp.where(lane == 2, -1.0, -scale)
    out_ref[0] = jnp.where(found, row, sentinel)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def decode_sbp_pallas(logits_nhwk: jnp.ndarray, input_w: int,
                      conf_threshold: float, pred: bool = True
                      ) -> jnp.ndarray:
    """[B, H, W, K] logits -> [B, K, 3] joints scaled to input size."""
    b, h, w, k = logits_nhwk.shape
    maps = jnp.transpose(logits_nhwk.astype(jnp.float32), (0, 3, 1, 2))
    scale = input_w / w
    kernel = functools.partial(
        _decode_kernel, conf_threshold=float(conf_threshold),
        apply_sigmoid=bool(pred), scale=float(scale), h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, _LANES), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(maps)
    return out[:, :, :3]
