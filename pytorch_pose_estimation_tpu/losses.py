"""Training losses as pure functions on NHWC tensors.

Reference semantics reproduced exactly (golden-tested against NumPy ports):

* SBP (reference: models/loss/sbp_loss.py:20-66): sigmoid on logits, then a
  weighted masked sum-MSE.  Positive region = pixels where target > 0,
  weighted lambda=5; negative region weighted 1; each term divided by
  (num_keypoints * 2); total divided by batch size.  Because the target is
  zero off the positive mask, masking the prediction reproduces the
  reference's ``mse(pred*mask, target)`` / ``mse(pred*n_mask, target*n_mask)``
  identities.

* SPM (reference: models/loss/spm_loss.py:23-105): channel 0 sigmoid + masked
  sum-MSE (lambda_root=1); channels 1..2K tanh + masked sum-SmoothL1
  (lambda_disp=0.1), both masked by the root-joint positive mask; total
  divided by batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 with beta=1 (torch default)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def sbp_loss(logits: jnp.ndarray, target: jnp.ndarray,
             lambda_positive: float = 5.0,
             lambda_negative: float = 1.0) -> jnp.ndarray:
    """logits, target: [B, H, W, K] (NHWC).  Returns scalar loss."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    batch = logits.shape[0]
    k = logits.shape[-1]

    pred = jax.nn.sigmoid(logits)
    pos = target > 0.0
    err_pos = jnp.where(pos, pred - target, 0.0)
    err_neg = jnp.where(pos, 0.0, pred)

    loss_pos = lambda_positive * jnp.sum(err_pos ** 2) / (k * 2)
    loss_neg = lambda_negative * jnp.sum(err_neg ** 2) / (k * 2)
    return (loss_pos + loss_neg) / batch


def sbp_loss_per_sample(logits: jnp.ndarray, target: jnp.ndarray,
                        lambda_positive: float = 5.0,
                        lambda_negative: float = 1.0) -> jnp.ndarray:
    """Per-sample SBP losses [B] (mean over B equals ``sbp_loss``); used for
    padded-batch eval where padded rows must be masked out on host."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    k = logits.shape[-1]
    pred = jax.nn.sigmoid(logits)
    pos = target > 0.0
    err_pos = jnp.where(pos, pred - target, 0.0)
    err_neg = jnp.where(pos, 0.0, pred)
    per = (lambda_positive * jnp.sum(err_pos ** 2, axis=(1, 2, 3))
           + lambda_negative * jnp.sum(err_neg ** 2, axis=(1, 2, 3)))
    return per / (k * 2)


def spm_loss(logits: jnp.ndarray, target: jnp.ndarray,
             lambda_root: float = 1.0,
             lambda_disp: float = 0.1) -> jnp.ndarray:
    """logits, target: [B, H, W, 1 + 2K] (NHWC).  Returns scalar loss."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    batch = logits.shape[0]

    pred_root = jax.nn.sigmoid(logits[..., :1])
    pred_disp = jnp.tanh(logits[..., 1:])
    true_root = target[..., :1]
    true_disp = target[..., 1:]

    mask = (true_root > 0.0).astype(jnp.float32)  # [B, H, W, 1]

    # mse(pred*mask, true) == masked mse because true==0 off the mask
    loss_root = lambda_root * jnp.sum((pred_root * mask - true_root) ** 2)
    # smooth_l1(pred*mask - true): off-mask true may be nonzero only where
    # another person's mask overlaps -- the reference multiplies only the
    # prediction by the root mask, so reproduce exactly that.
    loss_disp = lambda_disp * jnp.sum(_smooth_l1(pred_disp * mask - true_disp))
    return (loss_root + loss_disp) / batch


def spm_loss_per_sample(logits: jnp.ndarray, target: jnp.ndarray,
                        lambda_root: float = 1.0,
                        lambda_disp: float = 0.1) -> jnp.ndarray:
    """Per-sample SPM losses [B] (mean over B equals ``spm_loss``)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pred_root = jax.nn.sigmoid(logits[..., :1])
    pred_disp = jnp.tanh(logits[..., 1:])
    true_root = target[..., :1]
    true_disp = target[..., 1:]
    mask = (true_root > 0.0).astype(jnp.float32)
    loss_root = lambda_root * jnp.sum((pred_root * mask - true_root) ** 2,
                                      axis=(1, 2, 3))
    loss_disp = lambda_disp * jnp.sum(
        _smooth_l1(pred_disp * mask - true_disp), axis=(1, 2, 3))
    return loss_root + loss_disp
