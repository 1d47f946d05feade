"""Ground-truth target generation as vectorized device ops.

The reference stamps Gaussians / masks / displacement fields with per-joint
NumPy loops in 32 CPU worker processes (reference: utils/sbp_utils.py:20-53,
utils/spm_utils.py:16-95) -- a host hot loop at batch 256.  Here the same
math is expressed as broadcasted tensor ops over coordinate grids, jitted and
vmapped over the batch so target generation runs on the VPU fused with the
rest of the input pipeline.  All kernels are fp32 and element-wise equal to
the reference formulas (golden-tested in tests/test_targets.py against
straight NumPy ports of the reference math).

Reference math (SBP, utils/sbp_utils.py:33-53): for joint (x, y), skip if
x<0 or y<0; xi = clip(int(x), 0, W-1) likewise yi; stamp
``exp(-((px-xi)^2 + (py-yi)^2) / (2 sigma^2))`` on the window
``round(xi-3s-1) <= px < round(xi+3s+2)`` (clipped to the map), max-blended.
SPM differs (utils/spm_utils.py:29-47): skip predicate is ``x<=0 and y<=0``,
no int/clip of the center, multi-person max-blend per channel.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _grids(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return ys, xs


def _gaussian_stamp(cx, cy, valid, h, w, sigma):
    """Windowed Gaussian around (cx, cy) for a batch of joints.

    cx, cy, valid: [...] arrays; returns [..., h, w].  The stamp window is
    exactly the reference's rounded ul/br box so edge behavior matches for
    non-integer sigma too.
    """
    ys, xs = _grids(h, w)
    cx = cx[..., None, None]
    cy = cy[..., None, None]
    # reference window: ul = round(c - 3s - 1) (inclusive), br = round(c + 3s + 2) (exclusive)
    ulx = jnp.round(cx - 3 * sigma - 1)
    uly = jnp.round(cy - 3 * sigma - 1)
    brx = jnp.round(cx + 3 * sigma + 2)
    bry = jnp.round(cy + 3 * sigma + 2)
    in_win = (xs >= ulx) & (xs < brx) & (ys >= uly) & (ys < bry)
    # g is sampled at integer offsets from ul; its center sits at 3s+1
    gx = xs - ulx - (3 * sigma + 1)
    gy = ys - uly - (3 * sigma + 1)
    g = jnp.exp(-(gx ** 2 + gy ** 2) / (2.0 * sigma ** 2))
    return jnp.where(in_win & valid[..., None, None], g, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def sbp_heatmaps(joints: jnp.ndarray, output_res: Tuple[int, int],
                 num_joints: int, sigma: float) -> jnp.ndarray:
    """SBP per-keypoint heatmaps.

    joints: [K, 2] (x, y) in output-map coords; negatives mark invisible.
    Returns [K, H, W] fp32.
    """
    h, w = output_res
    x, y = joints[:, 0], joints[:, 1]
    valid = (x >= 0) & (y >= 0)
    # int() truncation then clip to the map, exactly as the reference
    xi = jnp.clip(x.astype(jnp.int32).astype(jnp.float32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32).astype(jnp.float32), 0, h - 1)
    return _gaussian_stamp(xi, yi, valid, h, w, float(sigma)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def spm_heatmaps(joints: jnp.ndarray, output_res: int, num_joints: int,
                 sigma: float) -> jnp.ndarray:
    """SPM multi-person heatmaps.

    joints: [P, J, 2]; a joint with x<=0 and y<=0 is skipped (the reference's
    sentinel for absent annotations).  Returns [J, H, W], max over persons.
    """
    h = w = output_res
    x, y = joints[..., 0], joints[..., 1]  # [P, J]
    valid = ~((x <= 0) & (y <= 0))
    stamps = _gaussian_stamp(x, y, valid, h, w, float(sigma))  # [P, J, H, W]
    return jnp.max(stamps, axis=0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def spm_masks(joints: jnp.ndarray, output_res: int, sigma: float) -> jnp.ndarray:
    """Per-person binary box masks around each joint
    (reference: utils/spm_utils.py:50-71).

    joints: [P, J, 2] integer coords.  Box half-width = int((6*sigma+2)/2).
    Returns [P, H, W] fp32 in {0, 1}.
    """
    h = w = output_res
    size = int((6 * sigma + 2) / 2)
    ys, xs = _grids(h, w)
    x = joints[..., 0].astype(jnp.float32)[..., None, None]  # [P, J, 1, 1]
    y = joints[..., 1].astype(jnp.float32)[..., None, None]
    valid = ~((x <= 0) & (y <= 0))
    in_box = (xs >= x - size) & (xs < x + size + 1) & \
             (ys >= y - size) & (ys < y + size + 1)
    per_joint = jnp.where(in_box & valid, 1.0, 0.0)  # [P, J, H, W]
    return jnp.max(per_joint, axis=1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def spm_displacements(joints: jnp.ndarray, masks: jnp.ndarray,
                      output_res: int, num_joints: int) -> jnp.ndarray:
    """Dense per-keypoint displacement fields
    (reference: utils/spm_utils.py:74-95).

    joints: [P, J, 2]; masks: [P, H, W].  For each person/joint,
    ``mask * (coord - grid) / Z`` with ``Z = sqrt(2) * output_res``,
    accumulated (+=) over persons.  Returns [2J, H, W].
    """
    h = w = output_res
    z = math.sqrt(output_res ** 2 + output_res ** 2)
    ys, xs = _grids(h, w)
    x = joints[..., 0].astype(jnp.float32)[..., None, None]  # [P, J, 1, 1]
    y = joints[..., 1].astype(jnp.float32)[..., None, None]
    valid = (~((x <= 0) & (y <= 0))).astype(jnp.float32)
    m = masks[:, None, :, :] * valid  # [P, J, H, W]
    dx = jnp.sum(m * (x - xs) / z, axis=0)  # [J, H, W]
    dy = jnp.sum(m * (y - ys) / z, axis=0)
    # interleave to [2J, H, W]: (dx0, dy0, dx1, dy1, ...)
    out = jnp.stack([dx, dy], axis=1).reshape(2 * num_joints, h, w)
    return out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def spm_target(centers: jnp.ndarray, joints: jnp.ndarray, output_res: int,
               num_joints: int, sigma: float) -> jnp.ndarray:
    """Full SPM training target: concat(root heatmap [1], displacements [2J]).

    centers: [P, 1, 2] root joints; joints: [P, J, 2].
    Matches dataset/spm_coco_dataset.py:77-86.
    """
    hm = spm_heatmaps(centers, output_res, 1, sigma)  # [1, H, W]
    masks = spm_masks(centers, output_res, sigma)     # [P, H, W]
    disp = spm_displacements(joints, masks, output_res, num_joints)
    return jnp.concatenate([hm, disp], axis=0)


def sbp_heatmaps_batch(joints: jnp.ndarray, output_res: Tuple[int, int],
                       num_joints: int, sigma: float) -> jnp.ndarray:
    """Batched [B, K, 2] -> [B, K, H, W], dispatching to the Pallas kernel
    on TPU (bit-identical, measured slightly faster) and the vmapped XLA
    formulation elsewhere (incl. interpret-mode-free CPU tests)."""
    if jax.default_backend() == "tpu":
        from .pallas.heatmap import sbp_heatmaps_pallas

        return sbp_heatmaps_pallas(joints, tuple(output_res), float(sigma))
    fn = functools.partial(sbp_heatmaps, output_res=tuple(output_res),
                           num_joints=num_joints, sigma=float(sigma))
    return jax.vmap(fn)(joints)


class SBPHeatmapGenerator:
    """Callable wrapper with the reference's constructor surface
    (reference: utils/sbp_utils.py:20-31).  vmap over a batch with
    ``generator.batch(joints_batch)``.
    """

    def __init__(self, output_res: Sequence[int], num_joints: int,
                 sigma: float = -1):
        self.output_res = (int(output_res[0]), int(output_res[1]))
        self.num_joints = num_joints
        if sigma < 0:
            sigma = self.output_res[0] / 64
        self.sigma = float(sigma)

    def __call__(self, joints) -> jnp.ndarray:
        return sbp_heatmaps(jnp.asarray(joints, jnp.float32), self.output_res,
                            self.num_joints, self.sigma)

    def batch(self, joints_batch) -> jnp.ndarray:
        return sbp_heatmaps_batch(jnp.asarray(joints_batch, jnp.float32),
                                  self.output_res, self.num_joints,
                                  self.sigma)


class SPMTargetGenerator:
    """Bundles heatmap+mask+displacement generation for SPM
    (reference classes at utils/spm_utils.py:16-95)."""

    def __init__(self, output_res: int, num_joints: int, sigma: float = -1):
        self.output_res = int(output_res)
        self.num_joints = num_joints
        if sigma < 0:
            sigma = self.output_res / 64
        self.sigma = float(sigma)

    def __call__(self, centers, joints) -> jnp.ndarray:
        return spm_target(jnp.asarray(centers, jnp.float32),
                          jnp.asarray(joints, jnp.float32),
                          self.output_res, self.num_joints, self.sigma)

    def batch(self, centers_batch, joints_batch) -> jnp.ndarray:
        fn = functools.partial(spm_target, output_res=self.output_res,
                               num_joints=self.num_joints, sigma=self.sigma)
        return jax.vmap(fn)(jnp.asarray(centers_batch, jnp.float32),
                            jnp.asarray(joints_batch, jnp.float32))
