"""Differential TRAIN-STEP parity vs a torch twin.

Forward parity (tests/test_torch_import.py) proves the models compute the
same function; this test proves the whole training RECIPE is the same
program: identical weights + identical batches through

  torch:  reference SBPLoss -> autograd -> SGD(nesterov, coupled wd)
          -> YoloLR stepped per optimizer step
  jax:    losses.sbp_loss -> jax.grad -> optax sgd chain
          -> optim.yolo_lr schedule

must produce matching loss trajectories over several steps.  The torch
side re-implements the reference formulas independently (loss:
models/loss/sbp_loss.py:20-49; optimizer step wiring:
module/sbp_detector.py:47-71; YoloLR: module/lr_scheduler.py:66-92).

BN note: train-mode forward normalizes by batch statistics on both sides,
so the (torch unbiased vs flax biased) running-var update rule does not
enter the differentiated path; running stats themselves are not compared
here (eval-mode parity is covered by the import tests).
"""

import bisect

import numpy as np
import torch
from torch import nn

import jax
import jax.numpy as jnp

from pytorch_pose_estimation_tpu.losses import sbp_loss
from pytorch_pose_estimation_tpu.models import SBP
from pytorch_pose_estimation_tpu.models.torch_import import (
    import_torch_state_dict,
)
from pytorch_pose_estimation_tpu.optim import get_optimizer, yolo_lr
from pytorch_pose_estimation_tpu.train import create_train_state

from golden.numpy_reference import sbp_heatmaps_np
from test_torch_import import _ref_style_sbp

import pytest

pytestmark = pytest.mark.slow

LR = 1e-3
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-3
BURN_IN = 4
LR_STEPS = [7]
LR_SCALES = [0.1]
N_STEPS = 10
K = 17
H, W = 64, 64  # stride-32 backbone => 2x2 bottleneck, 16x16 output


def _torch_sbp_loss(logits, target):
    """Reference SBPLoss (models/loss/sbp_loss.py:20-49): sigmoid, then
    positive region (target>0) weighted 5, negative 1, each summed and
    / (K*2), total / batch."""
    pred = torch.sigmoid(logits)
    pos = target > 0
    err_pos = torch.where(pos, pred - target, torch.zeros_like(pred))
    err_neg = torch.where(pos, torch.zeros_like(pred), pred)
    k = logits.shape[1]
    loss = (5.0 * err_pos.pow(2).sum() + 1.0 * err_neg.pow(2).sum()) / (k * 2)
    return loss / logits.shape[0]


def _yolo_lr_value(step, lr=LR, burn_in=BURN_IN, steps=LR_STEPS,
                   scales=LR_SCALES):
    """Reference YoloLR formula (module/lr_scheduler.py:66-92): quartic
    burn-in, then cumulative piecewise scales via bisect."""
    if step < burn_in:
        return lr * (step / burn_in) ** 4
    factor = 1.0
    for i in range(bisect.bisect_right(steps, step)):
        factor *= scales[i]
    return lr * factor


def _make_batches(rng, n_steps, batch=2):
    """(images NCHW fp32 in [0,1], target heatmaps NCHW) per step, targets
    from the NumPy reference stamping oracle."""
    out = []
    oh, ow = H // 4, W // 4
    for _ in range(n_steps):
        imgs = rng.rand(batch, 3, H, W).astype(np.float32)
        hms = []
        for _b in range(batch):
            joints = np.stack([rng.uniform(0, ow - 1, K),
                               rng.uniform(0, oh - 1, K)], axis=1)
            # a few invisible joints (sentinel -1) per sample
            drop = rng.rand(K) < 0.2
            joints[drop] = -1.0
            hms.append(sbp_heatmaps_np(joints, (oh, ow), K, sigma=1.0))
        out.append((imgs, np.stack(hms)))
    return out


def test_train_step_trajectory_matches_torch():
    torch.manual_seed(0)
    tm = _ref_style_sbp(num_keypoints=K)
    tm.train()

    batches = _make_batches(np.random.RandomState(7), N_STEPS)

    # ---- torch side: reference recipe --------------------------------
    opt = torch.optim.SGD(tm.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WEIGHT_DECAY, nesterov=True)
    torch_losses = []
    for step, (imgs, hms) in enumerate(batches):
        # YoloLR is stepped per optimizer step with initial scheduler
        # step at construction => update t uses lr(t)
        for group in opt.param_groups:
            group["lr"] = _yolo_lr_value(step)
        opt.zero_grad()
        loss = _torch_sbp_loss(tm(torch.from_numpy(imgs)),
                               torch.from_numpy(hms))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- jax side: identical initial weights through our stack -------
    torch.manual_seed(0)
    tm2 = _ref_style_sbp(num_keypoints=K)  # fresh copy of the same init
    variables = import_torch_state_dict(tm2.state_dict())

    schedule = yolo_lr(LR, BURN_IN, LR_STEPS, LR_SCALES)
    optimizer = get_optimizer("sgd", lr=LR, schedule=schedule,
                              momentum=MOMENTUM,
                              weight_decay=WEIGHT_DECAY, nesterov=True)
    model = SBP(num_keypoints=K)

    @jax.jit
    def train_step(state, images, target):
        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            return sbp_loss(logits, target), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads,
                                     batch_stats=new_stats), loss

    def run_jax(optimizer):
        s = create_train_state(model, optimizer, (1, H, W, 3))
        s = s.replace(params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=optimizer.init(variables["params"]))
        losses = []
        with jax.default_matmul_precision("highest"):
            for imgs, hms in batches:
                images = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
                target = jnp.asarray(np.transpose(hms, (0, 2, 3, 1)))
                s, loss = train_step(s, images, target)
                losses.append(float(loss))
        return np.asarray(losses)

    jax_losses = run_jax(optimizer)
    torch_losses = np.asarray(torch_losses)

    # steps 0-3 are the quartic burn-in (lr <= 3.2e-4): near-pure forward
    # parity, tight
    np.testing.assert_allclose(jax_losses[:4], torch_losses[:4], rtol=5e-4)
    # full trajectory through {momentum build-up, weight decay, full-lr
    # steps, the step-7 x0.1 lr drop}: fp32 conv-accumulation drift
    # compounds through the updates, so ~1% by step 10
    rel = np.abs(jax_losses - torch_losses) / np.abs(torch_losses)
    assert rel.max() < 2e-2, rel
    # and training must actually be moving (not a frozen no-op match)
    assert torch_losses[-1] < 0.5 * torch_losses[0]

    # negative control -- the test must DISCRIMINATE a wrong recipe: the
    # same chain with plain (non-nesterov) momentum diverges far more
    wrong = get_optimizer("sgd", lr=LR, schedule=schedule,
                          momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
                          nesterov=False)
    wrong_losses = run_jax(wrong)
    wrong_rel = np.abs(wrong_losses - torch_losses) / np.abs(torch_losses)
    assert wrong_rel.max() > 5 * rel.max(), (wrong_rel.max(), rel.max())


def test_yolo_lr_first_step_is_zero_like_torch_scheduler():
    """torch _LRScheduler calls step() at construction, so the FIRST
    optimizer update runs at lr(0) = 0 under quartic burn-in; the optax
    schedule sees count=0 for the first update -- both sides must agree."""
    schedule = yolo_lr(LR, BURN_IN, LR_STEPS, LR_SCALES)
    assert float(schedule(0)) == _yolo_lr_value(0) == 0.0
    for t in range(1, 10):
        np.testing.assert_allclose(float(schedule(t)), _yolo_lr_value(t),
                                   rtol=1e-6)
