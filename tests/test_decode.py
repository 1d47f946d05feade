"""Golden tests: batched decode kernels vs NumPy ports of the reference
decode loops (the decode side of bit parity)."""

import numpy as np
import jax.numpy as jnp

from pytorch_pose_estimation_tpu.ops import (
    DecodeSBP,
    DecodeSPM,
    decode_sbp_batch,
)
from pytorch_pose_estimation_tpu.ops.decode import _spm_peak_nms, _spm_keypoints

from golden import numpy_reference as ref


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_decode_sbp_matches_reference_random():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 17, 64, 48).astype(np.float32) * 3
    joints = np.asarray(decode_sbp_batch(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), 192, 0.25, True))
    for b in range(8):
        want = ref.decode_sbp_np(_sigmoid(logits[b]), 0.25)
        found = want[:, 2] >= 0
        want[found, :2] *= 192 / 48
        want[~found, :2] *= 192 / 48  # reference scales sentinels too
        np.testing.assert_allclose(joints[b], want, rtol=1e-5, atol=1e-5)


def test_decode_sbp_below_threshold_sentinel():
    heat = np.zeros((1, 3, 64, 48), np.float32)  # sigmoid -> 0.5 everywhere
    joints = np.asarray(DecodeSBP((256, 192), 0.9, pred=True)(heat))
    # no channel clears 0.9 -> all sentinels, scaled like the reference
    assert (joints[:, 2] == -1).all()


def test_decode_sbp_targets_roundtrip():
    """encode -> decode(pred=False) recovers the stamped joint locations."""
    from pytorch_pose_estimation_tpu.ops import sbp_heatmaps

    joints = np.array([[10, 20], [40, 60], [-1, -1], [47, 63]], np.float32)
    hms = sbp_heatmaps(joints, (64, 48), 4, 2.0)
    dec = np.asarray(DecodeSBP((256, 192), 0.99, pred=False)(np.asarray(hms)[None]))
    for i, (x, y) in enumerate(joints):
        if x < 0:
            assert dec[i, 2] == -1
        else:
            assert dec[i, 0] == x * 4 and dec[i, 1] == y * 4
            assert dec[i, 2] == 1.0


def test_spm_nms_matches_reference():
    rng = np.random.RandomState(1)
    for _ in range(5):
        heat = rng.rand(64, 64).astype(np.float32)
        got = np.asarray(_spm_peak_nms(jnp.asarray(heat), 0.9, 7.0, 100))
        got = got[got[:, 2] >= 0]
        want = ref.spm_nms_np(heat, 0.9, 7.0)
        assert got.shape == want.shape
        # same peak set (order is best-first in both)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_spm_keypoints_match_reference():
    rng = np.random.RandomState(2)
    disp = (rng.rand(34, 64, 64).astype(np.float32) - 0.5) * 0.5
    roots = np.array([[10, 20, 0.95], [50, 40, 0.91]], np.float32)
    got = np.asarray(_spm_keypoints(jnp.asarray(roots), jnp.asarray(disp), 7.0))
    want = ref.spm_keypoints_np(roots, disp, 7.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decode_spm_end_to_end_targets():
    """GT target -> decode(pred=False) recovers persons' joints."""
    from pytorch_pose_estimation_tpu.ops import spm_target

    centers = np.array([[[40, 40]], [[90, 100]]], np.float32)
    joints = np.stack([
        np.stack([np.linspace(20, 60, 17), np.full(17, 30)], axis=1),
        np.stack([np.linspace(70, 110, 17), np.full(17, 110)], axis=1),
    ]).astype(np.float32)
    target = spm_target(centers, joints, 128, 17, 1.0)
    dec = DecodeSPM(input_size=512, sigma=1, conf_threshold=0.5, pred=False)
    roots, kps = dec(np.asarray(target)[None])
    assert roots.shape[0] == 2
    got_roots = sorted((r[0], r[1]) for r in (roots[:, :2] / 4).tolist())
    assert got_roots == [(40.0, 40.0), (90.0, 100.0)]
