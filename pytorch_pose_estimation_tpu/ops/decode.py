"""Heatmap -> joints decoding as batched device ops.

The reference decodes with per-keypoint Python loops over torch tensors and
asserts batch==1 (reference: utils/sbp_utils.py:56-118,
utils/spm_utils.py:98-250).  Here decoding is fully vectorized, vmapped over
the batch, and jit-compiled, so the whole eval batch decodes in one XLA
launch.

Parity notes:
* SBP: the reference thresholds then argmaxes the surviving confidences in
  row-major order, which equals the first-occurrence global argmax whenever
  the max clears the threshold -- ``jnp.argmax`` has the same first-occurrence
  rule, so results are bit-identical.
* SPM: the reference's greedy peak NMS is data-dependent sequential; here it
  is a bounded-iteration loop (``max_persons`` rounds of masked argmax +
  distance suppression) that picks peaks in the same best-first order.
  Suppression keeps candidates at distance strictly > dist_threshold,
  matching utils/spm_utils.py:148-151.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# SBP
# --------------------------------------------------------------------------

@jax.jit
def _decode_sbp_maps(heatmaps: jnp.ndarray, conf_threshold: float) -> jnp.ndarray:
    """heatmaps: [K, H, W] -> joints [K, 3] = (x, y, conf); (-1,-1,-1) if the
    peak does not clear conf_threshold (strict >, like the reference)."""
    k, h, w = heatmaps.shape
    flat = heatmaps.reshape(k, h * w)
    idx = jnp.argmax(flat, axis=1)
    conf = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    found = conf > conf_threshold
    joints = jnp.stack([x, y, conf], axis=1)
    return jnp.where(found[:, None], joints, -1.0)


def decode_sbp(heatmaps: jnp.ndarray, input_size: Union[int, Sequence[int]],
               conf_threshold: float, pred: bool = True) -> jnp.ndarray:
    """Decode a single sample's SBP output.

    heatmaps: [K, H, W] (channel-first, reference layout) or [H, W, K]
    handled by decode_sbp_batch.  ``pred=True`` applies sigmoid first.
    Coordinates are scaled by input_size/output_size using width-only scalars
    exactly like the reference (valid because H and W ratios are both 4,
    utils/sbp_utils.py:103-118).
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    if pred:
        heatmaps = jax.nn.sigmoid(heatmaps)
    joints = _decode_sbp_maps(heatmaps, conf_threshold)
    in_w = input_size[-1] if hasattr(input_size, "__len__") else input_size
    scale = in_w / heatmaps.shape[-1]
    return joints.at[:, :2].multiply(scale)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def decode_sbp_batch(logits_nhwk: jnp.ndarray, input_w: int,
                     conf_threshold: float, pred: bool = True) -> jnp.ndarray:
    """Batched decode straight off the model's NHWC logits.

    logits_nhwk: [B, H, W, K] -> joints [B, K, 3] in input-size coords.
    This removes the reference's batch==1 assert and per-sample Python loop
    (utils/sbp_utils.py:104, :131-164).
    """
    x = logits_nhwk.astype(jnp.float32)
    if pred:
        x = jax.nn.sigmoid(x)
    maps = jnp.transpose(x, (0, 3, 1, 2))  # [B, K, H, W]
    joints = jax.vmap(lambda m: _decode_sbp_maps(m, conf_threshold))(maps)
    scale = input_w / logits_nhwk.shape[2]
    return joints.at[..., :2].multiply(scale)


def decode_sbp_fast(logits_nhwk: jnp.ndarray, input_w: int,
                    conf_threshold: float, pred: bool = True) -> jnp.ndarray:
    """Backend-dispatching batched decode: Pallas fused kernel on TPU
    (bit-identical to decode_sbp_batch), XLA formulation elsewhere."""
    if jax.default_backend() == "tpu":
        from .pallas.decode import decode_sbp_pallas

        return decode_sbp_pallas(logits_nhwk, int(input_w),
                                 float(conf_threshold), bool(pred))
    return decode_sbp_batch(logits_nhwk, int(input_w), float(conf_threshold),
                            bool(pred))


class DecodeSBP:
    """Reference-compatible decoder object (utils/sbp_utils.py:85-118).

    Accepts [B, K, H, W] (reference layout); batch must broadcast -- unlike
    the reference there is no batch==1 assert, any B works.
    Returns [K, 3] for B==1 else [B, K, 3].
    """

    def __init__(self, input_size, conf_threshold: float, pred: bool = True):
        self.input_size = input_size[-1] if hasattr(input_size, "__len__") \
            else input_size
        self.conf_threshold = float(conf_threshold)
        self.pred = pred

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        nhwk = jnp.transpose(x, (0, 2, 3, 1))
        joints = decode_sbp_batch(nhwk, int(self.input_size),
                                  self.conf_threshold, self.pred)
        return joints[0] if joints.shape[0] == 1 else joints


# --------------------------------------------------------------------------
# SPM
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _spm_peak_nms(heatmap: jnp.ndarray, conf_threshold: float,
                  dist_threshold: float, max_persons: int) -> jnp.ndarray:
    """Greedy peak NMS on [H, W] as a bounded fori_loop.

    Returns [max_persons, 3] (x, y, conf); empty slots are (-1, -1, -1).
    Each round takes the highest remaining above-threshold pixel and
    suppresses every candidate within dist_threshold (strict > keeps).
    """
    h, w = heatmap.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def body(i, carry):
        active, out = carry
        vals = jnp.where(active, heatmap, -jnp.inf)
        idx = jnp.argmax(vals)
        conf = vals.reshape(-1)[idx]
        px = (idx % w).astype(jnp.float32)
        py = (idx // w).astype(jnp.float32)
        found = conf > conf_threshold
        out = out.at[i].set(jnp.where(found,
                                      jnp.stack([px, py, conf]),
                                      jnp.full((3,), -1.0)))
        d = jnp.sqrt((xs - px) ** 2 + (ys - py) ** 2)
        suppress = d <= dist_threshold
        active = jnp.where(found, active & ~suppress, active)
        return active, out

    active0 = heatmap > conf_threshold
    out0 = jnp.full((max_persons, 3), -1.0, jnp.float32)
    _, out = jax.lax.fori_loop(0, max_persons, body, (active0, out0))
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def _spm_keypoints(root_joints: jnp.ndarray, displacements: jnp.ndarray,
                   dist_threshold: float) -> jnp.ndarray:
    """Read displacement fields at each root pixel
    (reference: utils/spm_utils.py:164-200).

    root_joints: [M, 3]; displacements: [2K, H, W].
    Returns [M, K, 3]; keypoints closer than dist_threshold to their root
    (strict <) are zeroed, invalid root slots give all-zero rows.
    """
    two_k, out_sz, _ = displacements.shape
    k = two_k // 2
    z = jnp.sqrt(2.0) * out_sz
    x = root_joints[:, 0]
    y = root_joints[:, 1]
    conf = root_joints[:, 2]
    valid = conf >= 0

    xi = jnp.clip(x.astype(jnp.int32), 0, out_sz - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, out_sz - 1)
    disp = displacements.reshape(k, 2, out_sz, out_sz)
    dx = disp[:, 0][:, yi, xi].T  # [M, K]
    dy = disp[:, 1][:, yi, xi].T
    kx = dx * z + x[:, None]
    ky = dy * z + y[:, None]
    d = jnp.sqrt((x[:, None] - kx) ** 2 + (y[:, None] - ky) ** 2)
    keep = (d >= dist_threshold) & valid[:, None]
    joints = jnp.stack(
        [kx, ky, jnp.broadcast_to(conf[:, None], kx.shape)], axis=-1
    )
    return jnp.where(keep[..., None], joints, 0.0)


def decode_spm(x: jnp.ndarray, input_size: int, sigma: float,
               conf_threshold: float, pred: bool = True,
               max_persons: int = 30) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode one SPM sample [1 + 2K, H, W] -> (roots [M,3], joints [M,K,3]),
    both scaled to input_size.  dist_threshold = (6*sigma + 2)/2
    (reference: utils/spm_utils.py:203-250)."""
    x = jnp.asarray(x, jnp.float32)
    dist_threshold = (6 * sigma + 2) / 2
    if pred:
        heatmap = jax.nn.sigmoid(x[0])
        disp = jnp.tanh(x[1:])
    else:
        heatmap = x[0]
        disp = x[1:]
    roots = _spm_peak_nms(heatmap, float(conf_threshold),
                          float(dist_threshold), max_persons)
    joints = _spm_keypoints(roots, disp, float(dist_threshold))
    scale = input_size / heatmap.shape[-1]
    valid = roots[:, 2] >= 0
    roots = roots.at[:, :2].multiply(scale)
    roots = jnp.where(valid[:, None], roots, -1.0)
    joints = joints.at[..., :2].multiply(scale)
    return roots, joints


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def decode_spm_batch(logits_nhwc: jnp.ndarray, input_size: int, sigma: float,
                     conf_threshold: float, pred: bool = True,
                     max_persons: int = 30
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched SPM decode straight off NHWC logits [B, H, W, 1+2K].

    Returns (roots [B, M, 3], joints [B, M, K, 3]) scaled to input_size;
    invalid root slots are (-1, -1, -1).  vmaps the bounded-iteration peak
    NMS so the whole eval batch decodes in one device call.
    """
    x = jnp.transpose(logits_nhwc.astype(jnp.float32), (0, 3, 1, 2))
    fn = functools.partial(decode_spm, input_size=input_size, sigma=sigma,
                           conf_threshold=conf_threshold, pred=pred,
                           max_persons=max_persons)
    return jax.vmap(fn)(x)


class DecodeSPM:
    """Reference-compatible SPM decoder (utils/spm_utils.py:203-250).

    Returns variable-length numpy arrays like the reference: invalid padded
    slots are stripped on the host.
    """

    def __init__(self, input_size: int, sigma: float, conf_threshold: float,
                 pred: bool = True, max_persons: int = 30):
        self.input_size = int(input_size)
        self.sigma = sigma
        self.conf_threshold = float(conf_threshold)
        self.pred = pred
        self.max_persons = max_persons

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 4:
            x = x[0]
        roots, joints = decode_spm(x, self.input_size, self.sigma,
                                   self.conf_threshold, self.pred,
                                   self.max_persons)
        roots = np.asarray(roots)
        joints = np.asarray(joints)
        keep = roots[:, 2] >= 0
        return roots[keep], joints[keep]
