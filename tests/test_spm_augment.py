"""SPM optional geometric augmentation path (off by default for parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_pose_estimation_tpu.models import SPM
from pytorch_pose_estimation_tpu.optim import get_optimizer
from pytorch_pose_estimation_tpu.train import create_train_state
from pytorch_pose_estimation_tpu.train.steps import make_spm_steps


def test_spm_geometric_train_step():
    model = SPM(num_keypoints=5)
    opt = get_optimizer("sgd", lr=1e-3, momentum=0.9)
    step, _ = make_spm_steps(model, opt, 64, 16, 5, 1.0,
                             augment={"geometric": True,
                                      "color_jitter": (0.0, 0.0, 0.0, 0.0)})
    state = create_train_state(model, opt, (1, 64, 64, 3))

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (2, 64, 64, 3), np.uint8),
        "joints": rng.uniform(5, 60, (2, 4, 5, 2)).astype(np.float32),
        "centers": rng.uniform(5, 60, (2, 4, 1, 2)).astype(np.float32),
    }
    # mark one person absent via the (0,0) sentinel
    batch["joints"][0, 3] = 0.0
    batch["centers"][0, 3] = 0.0

    state, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
    # another step with a different key must also be finite (randomness ok)
    state, loss2 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))
