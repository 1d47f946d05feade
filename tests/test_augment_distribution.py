"""Statistical tests: the device augmentation pipeline's per-sample
randomness must match Albumentations semantics (the reference train
transform, reference: dataset/sbp_coco_dataset.py:220-232):

* A.Rotate(limit=40) applies per sample with p=0.5 (Albumentations
  default) and draws the angle per SAMPLE uniformly in +-limit;
* A.ColorJitter(...) applies per sample with p=0.5;
* A.RandomResizedCrop applies with p=1.0.

The device pipeline shares each rotation angle across a contiguous group
of B/G samples (G = n_angle_groups(B, 8) matmul-shaped shear tensors);
the per-sample apply mask stays fully independent.  These tests recover
the applied parameters from the outputs over many PRNG keys and compare
apply rate / angle spread / jitter rate against a NumPy oracle drawing
from the exact Albumentations distributions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_pose_estimation_tpu.ops.image import (
    augment_batch, color_jitter_batch, n_angle_groups)


def test_n_angle_groups_divisors():
    assert n_angle_groups(256, 8) == 8
    assert n_angle_groups(16, 8) == 8
    assert n_angle_groups(4, 8) == 4
    assert n_angle_groups(6, 4) == 3
    assert n_angle_groups(7, 8) == 7
    assert n_angle_groups(1, 8) == 1
    assert n_angle_groups(32, 1) == 1


def _recover_angles(n_keys=40, batch=16, limit=40.0, rotate_prob=0.5):
    """Run augment_batch with an identity crop (square image, scale and
    ratio pinned to 1) and recover each sample's effective rotation angle
    exactly from the transformed keypoint (joints ride the per-sample
    rotation matrix in fp32)."""
    h = w = 32
    cx, cy = w / 2.0, h / 2.0
    imgs = np.zeros((batch, h, w, 3), np.uint8)
    # joint on a circle around the center -> angle = atan2 of the offset
    joints = np.tile(np.asarray([[cx + 10.0, cy]], np.float32),
                     (batch, 1, 1))
    vis = np.ones((batch, 1), np.float32)
    angles = []
    for seed in range(n_keys):
        _, nj, _ = augment_batch(
            jax.random.PRNGKey(seed), jnp.asarray(imgs),
            jnp.asarray(joints), jnp.asarray(vis), (h, w), limit,
            (1.0, 1.0), (1.0, 1.0), (0.0, 0.0, 0.0, 0.0), 0.0,
            jnp.float32, rotate_prob, 0.0, 8)
        d = np.asarray(nj)[:, 0] - np.asarray([cx, cy])
        angles.append(np.degrees(np.arctan2(d[:, 1], d[:, 0])))
    return np.asarray(angles)  # [n_keys, batch]


def test_rotation_apply_rate_and_angle_distribution():
    limit = 40.0
    angles = _recover_angles(n_keys=40, batch=16, limit=limit)
    flat = angles.ravel()
    applied = np.abs(flat) > 1e-4

    # oracle: per-sample Bernoulli(0.5) apply + uniform(-limit, limit)
    rng = np.random.RandomState(0)
    o_apply = rng.uniform(size=flat.size) < 0.5
    o_angles = rng.uniform(-limit, limit, size=flat.size)[o_apply]

    # apply rate matches the oracle's p=0.5 (binomial tolerance)
    rate = applied.mean()
    assert abs(rate - o_apply.mean()) < 0.08, (rate, o_apply.mean())
    assert abs(rate - 0.5) < 0.08, rate

    # applied angles: uniform(-40, 40) moments and support
    got = flat[applied]
    assert np.abs(got).max() <= limit + 1e-3
    assert abs(got.mean() - o_angles.mean()) < 5.0
    assert abs(got.std() - o_angles.std()) < 4.0  # uniform std ~23.1
    # coarse uniformity: all four quarter-bins populated
    hist, _ = np.histogram(got, bins=4, range=(-limit, limit))
    assert hist.min() > 0.25 * got.size / 4, hist


def test_rotation_groups_share_angles_within_batch():
    """With batch 16 / G=8, contiguous pairs share an angle when both
    applied; a batch carries up to 8 distinct nonzero angles (intra-batch
    diversity restored vs the single batch-shared draw)."""
    angles = _recover_angles(n_keys=24, batch=16, rotate_prob=1.0)
    for row in angles:
        nz = np.round(row, 3)
        # pairs (2i, 2i+1) share the group angle
        assert np.allclose(nz[0::2], nz[1::2], atol=1e-2), nz
        # several distinct draws per batch (8 groups; allow rare collision)
        assert len(np.unique(nz[0::2])) >= 6, nz


def test_rotation_apply_is_per_sample_not_per_batch():
    """At p=0.5 nearly every batch of 16 must contain BOTH rotated and
    unrotated samples -- a batch-shared apply flag would make each batch
    all-or-nothing."""
    angles = _recover_angles(n_keys=30, batch=16)
    mixed = 0
    for row in angles:
        applied = np.abs(row) > 1e-4
        if 0 < applied.sum() < len(row):
            mixed += 1
    assert mixed >= 27, mixed  # P(all-or-nothing) = 2^-15 per batch


def test_color_jitter_apply_rate():
    """color_jitter_batch(apply_prob=0.5): non-applied samples come back
    bit-identical; the applied fraction matches the Bernoulli oracle."""
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(32, 8, 8, 3).astype(np.float32))
    changed = []
    for seed in range(30):
        out = color_jitter_batch(jax.random.PRNGKey(seed), imgs,
                                 apply_prob=0.5)
        diff = np.abs(np.asarray(out) - np.asarray(imgs)).max(axis=(1, 2, 3))
        changed.append(diff > 0.0)
    rate = np.concatenate(changed).mean()
    # a jitter draw is identity with probability ~0, so changed ~= applied
    assert abs(rate - 0.5) < 0.07, rate


def test_color_jitter_apply_prob_one_unchanged_api():
    imgs = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3)
                       .astype(np.float32))
    a = color_jitter_batch(jax.random.PRNGKey(0), imgs)
    b = color_jitter_batch(jax.random.PRNGKey(0), imgs, apply_prob=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_augment_batch_jitter_prob_zero_is_photometric_identity():
    """jitter_prob=0 + rotate_prob=0 + identity crop => pixels pass
    through (up to bf16 resampling rounding)."""
    h = w = 32
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (4, h, w, 3), np.uint8)
    joints = np.full((4, 1, 2), 16.0, np.float32)
    vis = np.ones((4, 1), np.float32)
    out, _, _ = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(joints),
        jnp.asarray(vis), (h, w), 40.0, (1.0, 1.0), (1.0, 1.0),
        (0.5, 0.2, 0.5, 0.1), 0.0, jnp.float32, 0.0, 0.0, 8)
    ref = imgs.astype(np.float32) / 255.0
    assert np.abs(np.asarray(out) - ref).max() < 0.02
