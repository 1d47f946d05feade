"""Loss golden tests vs NumPy ports of the reference formulas, plus torch
cross-checks of the masked-MSE identities."""

import numpy as np
import jax.numpy as jnp

from pytorch_pose_estimation_tpu.losses import sbp_loss, spm_loss
from pytorch_pose_estimation_tpu.ops import sbp_heatmaps

from golden import numpy_reference as ref


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_sbp_loss_matches_reference():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 17, 16, 12).astype(np.float32)
    target = np.zeros_like(logits)
    for b in range(4):
        joints = rng.uniform(0, 12, size=(17, 2)).astype(np.float32)
        target[b] = np.asarray(sbp_heatmaps(joints, (16, 12), 17, 1.0))

    got = float(sbp_loss(jnp.asarray(_nchw_to_nhwc(logits)),
                         jnp.asarray(_nchw_to_nhwc(target))))
    want = ref.sbp_loss_np(logits, target)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sbp_loss_zero_target():
    logits = np.full((2, 3, 8, 8), -20.0, np.float32)  # sigmoid ~ 0
    target = np.zeros_like(logits)
    got = float(sbp_loss(jnp.asarray(_nchw_to_nhwc(logits)),
                         jnp.asarray(_nchw_to_nhwc(target))))
    assert got < 1e-12


def test_spm_loss_matches_reference():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 35, 16, 16).astype(np.float32)
    target = rng.rand(2, 35, 16, 16).astype(np.float32) - 0.3
    target[:, 0] = np.maximum(target[:, 0], 0)  # root heatmap is nonnegative

    got = float(spm_loss(jnp.asarray(_nchw_to_nhwc(logits)),
                         jnp.asarray(_nchw_to_nhwc(target))))
    want = ref.spm_loss_np(logits, target)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sbp_loss_gradient_flows():
    import jax

    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    target = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    g = jax.grad(lambda l: sbp_loss(l, target))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
