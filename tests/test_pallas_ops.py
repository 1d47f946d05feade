"""Pallas kernels vs their XLA twins (interpret mode on CPU; the same code
compiles natively on TPU -- exercised by bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_pose_estimation_tpu.ops import decode_sbp_batch, sbp_heatmaps
from pytorch_pose_estimation_tpu.ops.pallas import (
    decode_sbp_pallas,
    sbp_heatmaps_pallas,
)


def test_pallas_heatmaps_match_xla():
    rng = np.random.RandomState(0)
    joints = rng.uniform(-10, 70, size=(4, 17, 2)).astype(np.float32)
    joints[rng.rand(4, 17) < 0.3] = -1
    got = np.asarray(sbp_heatmaps_pallas(jnp.asarray(joints), (64, 48), 2.0))
    want = np.stack([np.asarray(sbp_heatmaps(j, (64, 48), 17, 2.0))
                     for j in joints])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pallas_decode_matches_xla():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 64, 48, 17).astype(np.float32) * 3
    got = np.asarray(decode_sbp_pallas(jnp.asarray(logits), 192, 0.25, True))
    want = np.asarray(decode_sbp_batch(jnp.asarray(logits), 192, 0.25, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_decode_sentinels():
    logits = np.full((2, 64, 48, 3), -20.0, np.float32)  # sigmoid ~ 0
    got = np.asarray(decode_sbp_pallas(jnp.asarray(logits), 192, 0.25, True))
    want = np.asarray(decode_sbp_batch(jnp.asarray(logits), 192, 0.25, True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert (got[..., 2] == -1).all()


def test_pallas_decode_gt_mode():
    joints = np.array([[10, 20], [40, 60], [-1, -1]], np.float32)
    hms = np.asarray(sbp_heatmaps(joints, (64, 48), 3, 2.0))
    maps_nhwk = np.transpose(hms, (1, 2, 0))[None]
    got = np.asarray(decode_sbp_pallas(jnp.asarray(maps_nhwk), 192, 0.99,
                                       False))[0]
    assert got[0].tolist() == [40.0, 80.0, 1.0]
    assert got[2, 2] == -1.0
