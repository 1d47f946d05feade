"""Pallas TPU kernel: batched Gaussian heatmap target stamping.

Replaces the reference's per-joint NumPy stamping loop
(reference: utils/sbp_utils.py:33-53) with one VPU pass per sample: each
grid program renders all K channels of one sample's [K, H, W] target from
its joint coordinates, entirely in VMEM -- no HBM round-trips between the
window test and the exp.

Semantics are identical to ops.targets.sbp_heatmaps (and therefore to the
reference formula): int-truncate + clip the center, rounded ul/br window,
exp(-(d^2)/(2 sigma^2)), skip joints with x<0 or y<0.

Runs in interpreter mode automatically off-TPU so CPU tests exercise the
same code path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _heatmap_kernel(joints_ref, out_ref, *, sigma: float, h: int, w: int):
    joints = joints_ref[0]                      # [K, 2] fp32 in VMEM
    k = joints.shape[0]
    x = joints[:, 0]
    y = joints[:, 1]
    valid = (x >= 0.0) & (y >= 0.0)
    xi = jnp.clip(x.astype(jnp.int32).astype(jnp.float32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32).astype(jnp.float32), 0, h - 1)

    # Mosaic requires integer iota; cast after
    ys = jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 2).astype(jnp.float32)
    cx = xi[:, None, None]
    cy = yi[:, None, None]
    ulx = jnp.round(cx - 3 * sigma - 1)
    uly = jnp.round(cy - 3 * sigma - 1)
    brx = jnp.round(cx + 3 * sigma + 2)
    bry = jnp.round(cy + 3 * sigma + 2)
    in_win = (xs >= ulx) & (xs < brx) & (ys >= uly) & (ys < bry)
    gx = xs - ulx - (3 * sigma + 1)
    gy = ys - uly - (3 * sigma + 1)
    g = jnp.exp(-(gx * gx + gy * gy) / (2.0 * sigma * sigma))
    out_ref[0] = jnp.where(in_win & valid[:, None, None], g, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def sbp_heatmaps_pallas(joints: jnp.ndarray, output_res: Tuple[int, int],
                        sigma: float) -> jnp.ndarray:
    """joints: [B, K, 2] -> heatmaps [B, K, H, W] fp32.

    Grid = (B,); each program stamps one sample's K channels in VMEM.
    """
    b, k, _ = joints.shape
    h, w = output_res
    kernel = functools.partial(_heatmap_kernel, sigma=float(sigma), h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(joints.astype(jnp.float32))
