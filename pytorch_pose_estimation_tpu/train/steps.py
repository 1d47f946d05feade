"""Jitted train / eval steps for SBP and SPM.

One XLA launch per step does everything after the uint8 batch lands on
device: augmentation (rotate+RRC+color-jitter), Gaussian/displacement
target generation, forward, loss, backward, optimizer update -- replacing
the reference's host-side Albumentations + NumPy target workers + Lightning
step (reference call stack: SURVEY.md section 3.1).

Under a sharded-batch input, XLA inserts the gradient/BN all-reduces over
the mesh's data axis; there is no explicit pmap/psum in this code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..losses import (sbp_loss, sbp_loss_per_sample, spm_loss,
                      spm_loss_per_sample)
from ..ops.image import augment_batch, color_jitter_batch, normalize_batch
from ..ops.targets import sbp_heatmaps_batch, spm_target


def _sbp_targets(joints, vis, ratio, output_size, num_keypoints, sigma):
    """joints [B,K,2] input px + vis [B,K] -> NHWC heatmaps [B,h,w,K].
    Scale to output res, invisible -> -1 (the generator's skip sentinel),
    exactly the reference dataset's encode chain
    (dataset/sbp_coco_dataset.py:71-77).  Uses the Pallas stamping kernel
    on TPU."""
    scaled = joints * ratio
    scaled = jnp.where(vis[..., None] >= 1, scaled, -1.0)
    maps = sbp_heatmaps_batch(scaled, tuple(output_size), num_keypoints,
                              sigma)
    return jnp.transpose(maps, (0, 2, 3, 1))


def make_sbp_steps(model, optimizer, input_size, output_size: Tuple[int, int],
                   num_keypoints: int, sigma: float, augment: dict = None,
                   decode_conf_threshold: float = None):
    """Returns (train_step, eval_step).

    train_step(state, batch, rng) -> (state, loss)
      batch: image uint8 [B,H,W,3], joints [B,K,2], joints_vis [B,K]
    eval_step(state, batch) -> (per-sample losses [B], decoded joints
      [B,K,3] in input coords) when ``decode_conf_threshold`` is set --
    decoding on device keeps the device->host transfer at K*3 floats per
    sample instead of the full heatmap volume.  With it unset, returns
    (losses, logits NHWC).
    """
    ratio = output_size[0] / input_size[0]
    augment = augment or {}
    rotate_limit = augment.get("rotate_limit", 40.0)
    scale_range = tuple(augment.get("scale_range", (0.4, 1.0)))
    ratio_range = tuple(augment.get("ratio_range", (0.4, 1.6)))
    jitter = tuple(augment.get("color_jitter", (0.5, 0.2, 0.5, 0.1)))
    clahe_prob = float(augment.get("clahe_prob", 0.0))  # device CLAHE
    # Albumentations default per-sample apply probability is 0.5 for
    # Rotate and ColorJitter (reference: dataset/sbp_coco_dataset.py:220-227)
    rotate_prob = float(augment.get("rotate_prob", 0.5))
    jitter_prob = float(augment.get("jitter_prob", 0.5))
    # G=16 is the measured knee of the grouped-rotation cost curve at
    # batch 256 (109.4 ms/step == G=8's 110.2; per-sample G=B is +51%,
    # DESIGN.md angle-group table / `python bench.py angles`)
    angle_groups = int(augment.get("angle_groups", 16))
    out_hw = (int(input_size[0]), int(input_size[1]))

    model_dtype = getattr(model, "dtype", jnp.float32) or jnp.float32

    def train_step(state, batch, rng):
        images, joints, vis = augment_batch(
            rng, batch["image"], batch["joints"], batch["joints_vis"],
            out_hw, rotate_limit, scale_range, ratio_range, jitter,
            clahe_prob, model_dtype, rotate_prob, jitter_prob,
            angle_groups)
        target = _sbp_targets(joints, vis, ratio, output_size,
                              num_keypoints, sigma)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            return sbp_loss(logits, target), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss

    def eval_step(state, batch):
        """Returns (per-sample losses [B], decoded joints or logits) --
        per-sample losses let padded eval rows be masked on host."""
        images = normalize_batch(batch["image"])
        target = _sbp_targets(batch["joints"], batch["joints_vis"], ratio,
                              output_size, num_keypoints, sigma)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        losses = sbp_loss_per_sample(logits, target)
        if decode_conf_threshold is not None:
            from ..ops.decode import decode_sbp_fast

            joints = decode_sbp_fast(logits, int(input_size[1]),
                                     float(decode_conf_threshold), True)
            return losses, joints
        return losses, logits

    return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))


def make_spm_steps(model, optimizer, input_size: int, output_size: int,
                   num_keypoints: int, sigma: float, augment: dict = None,
                   decode_conf_threshold: float = None,
                   max_persons: int = 30):
    """SPM steps.  batch: image uint8 [B,S,S,3], joints [B,P,K,2],
    centers [B,P,1,2] (input px).  Train augmentation is color jitter only,
    mirroring the reference's SPM transform list (rotate/RRC commented out,
    dataset/spm_coco_dataset.py:228-241).

    With ``decode_conf_threshold`` set, eval_step returns
    (losses, (roots [B,M,3], joints [B,M,K,3])) decoded on device.

    ``augment={'geometric': True}`` enables rotate + random-resized-crop for
    SPM too (the reference ships these commented out for SPM; off by
    default for parity).  All persons' joints and root centers ride the
    same per-sample transform; points leaving the frame become the (0, 0)
    absent sentinel."""
    ratio = output_size / input_size
    augment = augment or {}
    jitter = tuple(augment.get("color_jitter", (0.5, 0.2, 0.5, 0.1)))
    jitter_prob = float(augment.get("jitter_prob", 0.5))
    clahe_prob = float(augment.get("clahe_prob", 0.0))  # device CLAHE
    geometric = bool(augment.get("geometric", False))
    rotate_limit = augment.get("rotate_limit", 30.0)
    scale_range = tuple(augment.get("scale_range", (0.6, 1.0)))
    ratio_range = tuple(augment.get("ratio_range", (0.75, 1.33)))

    def _targets(joints, centers):
        # the reference casts output-res keypoints to int64
        # (dataset/spm_coco_dataset.py:73)
        j = jnp.floor(joints * ratio)
        c = jnp.floor(centers * ratio)
        fn = functools.partial(spm_target, output_res=output_size,
                               num_joints=num_keypoints, sigma=sigma)
        maps = jax.vmap(lambda cc, jj: fn(cc, jj))(c, j)  # [B, 1+2K, h, w]
        return jnp.transpose(maps, (0, 2, 3, 1))

    def train_step(state, batch, rng):
        if geometric:
            b, s = batch["image"].shape[0], batch["image"].shape[1]
            p, k2 = batch["joints"].shape[1], batch["joints"].shape[2]
            pts = jnp.concatenate(
                [batch["joints"].reshape(b, p * k2, 2),
                 batch["centers"].reshape(b, p, 2)], axis=1)
            valid = (~((pts[..., 0] <= 0) & (pts[..., 1] <= 0))
                     ).astype(jnp.float32)
            images, pts, valid = augment_batch(
                rng, batch["image"], pts, valid, (s, s), rotate_limit,
                scale_range, ratio_range, jitter, clahe_prob)
            pts = jnp.where(valid[..., None] >= 1, pts, 0.0)
            joints = pts[:, :p * k2].reshape(b, p, k2, 2)
            centers = pts[:, p * k2:].reshape(b, p, 1, 2)
            target = _targets(joints, centers)
        else:
            dt = getattr(model, "dtype", jnp.float32) or jnp.float32
            k_cl, k_col = jax.random.split(rng)
            images = batch["image"].astype(jnp.float32) / 255.0
            if clahe_prob > 0:
                # per-example device CLAHE, reference SPM transform position
                # (CLAHE -> ColorJitter, dataset/spm_coco_dataset.py:228-241)
                from ..ops.image import clahe_luma_batch

                images = clahe_luma_batch(k_cl, images, clahe_prob)
            images = color_jitter_batch(k_col, images.astype(dt), *jitter,
                                        apply_prob=jitter_prob)
            target = _targets(batch["joints"], batch["centers"])

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            return spm_loss(logits, target), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss

    def eval_step(state, batch):
        images = normalize_batch(batch["image"])
        target = _targets(batch["joints"], batch["centers"])
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        losses = spm_loss_per_sample(logits, target)
        if decode_conf_threshold is not None:
            from ..ops.decode import decode_spm_batch

            decoded = decode_spm_batch(logits, int(input_size),
                                       float(sigma),
                                       float(decode_conf_threshold), True,
                                       int(max_persons))
            return losses, decoded
        return losses, logits

    return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))
