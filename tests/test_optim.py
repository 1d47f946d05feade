"""Optimizer/schedule parity tests vs torch.optim on identical sequences."""

import numpy as np
import jax.numpy as jnp
import torch

from pytorch_pose_estimation_tpu.optim import (
    build_optimizer_from_cfg,
    cosine_annealing_warm_up_restarts,
    get_optimizer,
    get_scheduler,
    multi_step,
    yolo_lr,
)


def test_yolo_lr_curve():
    sched = yolo_lr(1e-3, burn_in=100, steps=[500, 800], scales=[0.1, 0.1])
    lrs = np.array([float(sched(t)) for t in [0, 50, 99, 100, 499, 500, 799, 800, 1000]])
    np.testing.assert_allclose(lrs[0], 0.0)
    np.testing.assert_allclose(lrs[1], 1e-3 * 0.5 ** 4, rtol=1e-6)
    np.testing.assert_allclose(lrs[3], 1e-3, rtol=1e-6)
    np.testing.assert_allclose(lrs[4], 1e-3, rtol=1e-6)
    np.testing.assert_allclose(lrs[5], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(lrs[7], 1e-5, rtol=1e-6)
    np.testing.assert_allclose(lrs[8], 1e-5, rtol=1e-6)


def test_multi_step():
    sched = multi_step(1.0, milestones=[10, 20], gamma=0.1)
    np.testing.assert_allclose(float(sched(9)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)


def test_cosine_warm_up_restarts_shape():
    base, eta_max, T_0, T_up = 1e-5, 1e-3, 100, 20
    sched = cosine_annealing_warm_up_restarts(
        base, T_0=T_0, T_mult=2, eta_max=eta_max, T_up=T_up, gamma=0.5)
    # warm-up: linear from base to eta_max
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)),
                               base + (eta_max - base) * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(20)), eta_max, rtol=1e-5)
    # end of first cycle decays to ~base
    assert float(sched(99)) < base * 3
    # second cycle peak decayed by gamma; cycle spans T_up + 80*2 = 180
    np.testing.assert_allclose(float(sched(100 + 20)), eta_max * 0.5, rtol=1e-5)


def test_sgd_matches_torch():
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=1e-2, momentum=0.9, weight_decay=5e-3,
                           nesterov=True)
    opt = get_optimizer("sgd", lr=1e-2, momentum=0.9, weight_decay=5e-3,
                        nesterov=True)
    params = jnp.asarray(w0.copy())
    state = opt.init(params)

    rng = np.random.RandomState(1)
    for _ in range(5):
        g = rng.randn(5).astype(np.float32)
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch():
    w0 = np.random.RandomState(2).randn(4).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=1e-3, weight_decay=1e-2)
    opt = get_optimizer("adamw", lr=1e-3, weight_decay=1e-2)
    params = jnp.asarray(w0.copy())
    state = opt.init(params)
    rng = np.random.RandomState(3)
    for _ in range(5):
        g = rng.randn(4).astype(np.float32)
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_build_from_cfg_fallback_without_scheduler():
    cfg = {"optimizer": "sgd",
           "optimizer_options": {"lr": 1e-3, "momentum": 0.9}}
    opt, sched = build_optimizer_from_cfg(cfg)
    assert opt is not None
    np.testing.assert_allclose(float(sched(123)), 1e-3)


def test_build_from_cfg_reference_recipe():
    cfg = {
        "optimizer": "sgd",
        "optimizer_options": {"lr": 1e-3, "momentum": 0.9,
                              "weight_decay": 5e-3, "nesterov": True},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 2000, "steps": [105000],
                              "scales": [0.1]},
    }
    opt, sched = build_optimizer_from_cfg(cfg)
    assert opt is not None
    np.testing.assert_allclose(float(sched(2000)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(105000)), 1e-4, rtol=1e-6)


def test_unknown_registry_names_return_none():
    assert get_optimizer("nope") is None
    assert get_scheduler("nope", 1e-3) is None
