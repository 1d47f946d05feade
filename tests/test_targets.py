"""Golden tests: vectorized device target generators vs NumPy ports of the
reference formulas (encode side of the bit-parity requirement)."""

import numpy as np

from pytorch_pose_estimation_tpu.ops import (
    SBPHeatmapGenerator,
    SPMTargetGenerator,
    sbp_heatmaps,
    spm_displacements,
    spm_heatmaps,
    spm_masks,
)

from golden import numpy_reference as ref


def test_sbp_heatmaps_match_reference():
    rng = np.random.RandomState(0)
    for sigma in (1, 2):
        for _ in range(5):
            joints = rng.uniform(-10, 70, size=(17, 2)).astype(np.float32)
            # sprinkle invisible sentinels
            joints[rng.rand(17) < 0.3] = -1
            got = np.asarray(sbp_heatmaps(joints, (64, 48), 17, float(sigma)))
            want = ref.sbp_heatmaps_np(joints, (64, 48), 17, float(sigma))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sbp_heatmaps_edge_clipping():
    # centers beyond every edge must clip exactly like the reference
    joints = np.array([[-0.5, 30], [100, 30], [30, -0.2], [30, 100],
                       [0, 0], [47, 63], [3.7, 9.2]], np.float32)
    got = np.asarray(sbp_heatmaps(joints, (64, 48), 7, 2.0))
    want = ref.sbp_heatmaps_np(joints, (64, 48), 7, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sbp_generator_default_sigma():
    gen = SBPHeatmapGenerator((64, 48), 17, sigma=-1)
    assert gen.sigma == 1.0  # output_h / 64


def test_sbp_batch_vmap():
    rng = np.random.RandomState(3)
    joints = rng.uniform(-5, 70, size=(4, 17, 2)).astype(np.float32)
    gen = SBPHeatmapGenerator((64, 48), 17, sigma=2)
    batched = np.asarray(gen.batch(joints))
    for i in range(4):
        np.testing.assert_allclose(
            batched[i], np.asarray(gen(joints[i])), rtol=1e-6, atol=1e-6
        )


def test_spm_heatmaps_match_reference():
    rng = np.random.RandomState(1)
    joints = rng.randint(-5, 128, size=(3, 18, 2)).astype(np.float32)
    joints[0, :4] = 0  # absent-sentinel rows
    got = np.asarray(spm_heatmaps(joints, 128, 18, 1.0))
    want = ref.spm_heatmaps_np(joints, 128, 18, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_spm_masks_match_reference():
    rng = np.random.RandomState(2)
    joints = rng.randint(-5, 128, size=(3, 1, 2))
    got = np.asarray(spm_masks(joints.astype(np.float32), 128, 1.0))
    want = ref.spm_masks_np(joints, 128, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_spm_displacements_match_reference():
    rng = np.random.RandomState(4)
    num_joints = 17
    joints = rng.randint(-5, 128, size=(3, num_joints, 2))
    centers = rng.randint(1, 127, size=(3, 1, 2))
    masks = ref.spm_masks_np(centers, 128, 1.0)
    got = np.asarray(spm_displacements(joints.astype(np.float32),
                                       masks, 128, num_joints))
    want = ref.spm_displacements_np(joints, masks, 128, num_joints)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spm_full_target_shape():
    gen = SPMTargetGenerator(128, 17, sigma=1)
    centers = np.array([[[64, 64]], [[30, 90]]], np.float32)
    joints = np.random.RandomState(5).randint(
        1, 127, size=(2, 17, 2)).astype(np.float32)
    target = np.asarray(gen(centers, joints))
    assert target.shape == (1 + 34, 128, 128)
    # root channel peaks at the centers
    assert target[0, 64, 64] == 1.0
    assert target[0, 90, 30] == 1.0
