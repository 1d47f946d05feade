"""Optimizers and LR schedules as optax transforms / pure schedule functions.

Replaces the reference's torch.optim registries (reference:
utils/module_select.py:13-35) and custom schedulers (reference:
module/lr_scheduler.py:10-92).  All schedules are pure functions of the
optimizer step count (the reference steps its schedulers per optimizer step,
'interval': 'step', module/sbp_detector.py:66), so they trace cleanly under
jit and need no host-side mutable state.

Torch-semantics notes:
* sgd/adam/radam/rmsprop apply weight decay *coupled* (added to the gradient
  before the momentum/adaptive statistics), adamw applies it decoupled --
  the chains below reproduce that ordering exactly.
* ``yolo_lr``: quartic burn-in ``(t/burn_in)^4`` then piecewise decay at
  ``steps`` by cumulative ``scales`` (reference: module/lr_scheduler.py:66-92).
* ``cosine_annealing_warm_up_restarts``: linear warm-up over ``T_up`` steps to
  ``eta_max * gamma**cycle``, cosine decay back to base lr, restart with the
  post-warm-up span scaled by ``T_mult``
  (reference: module/lr_scheduler.py:10-63).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


# --------------------------------------------------------------------------
# LR schedules
# --------------------------------------------------------------------------

def yolo_lr(lr: float, burn_in: int, steps: Sequence[int],
            scales: Sequence[float]) -> Schedule:
    steps = jnp.asarray(list(steps), jnp.float32)
    scales = jnp.asarray(list(scales), jnp.float32)

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        warm = lr * (t / burn_in) ** 4
        # cumulative product of scales for every boundary already passed
        passed = (steps <= t).astype(jnp.float32)
        scale = jnp.prod(jnp.where(passed > 0, scales, 1.0))
        return jnp.where(t < burn_in, warm, lr * scale)

    return schedule


def multi_step(lr: float, milestones: Sequence[int], gamma: float) -> Schedule:
    milestones = jnp.asarray(list(milestones), jnp.float32)

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        n = jnp.sum((milestones <= t).astype(jnp.float32))
        return lr * gamma ** n

    return schedule


def cosine_annealing_warm_restarts(lr: float, T_0: int, T_mult: int = 1,
                                   eta_min: float = 0.0) -> Schedule:
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts semantics."""

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(t, T_0)
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            # n = floor(log_mult(t/T_0*(mult-1)+1))
            n = jnp.floor(
                jnp.log(t / T_0 * (T_mult - 1) + 1.0) / math.log(T_mult)
            )
            start = T_0 * (T_mult ** n - 1.0) / (T_mult - 1.0)
            t_cur = t - start
            t_i = T_0 * T_mult ** n
        return eta_min + (lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule


def cosine_annealing_warm_up_restarts(lr: float, T_0: int, T_mult: int = 1,
                                      eta_max: float = 0.1, T_up: int = 0,
                                      gamma: float = 1.0) -> Schedule:
    """Warm-up + cosine restarts with peak decay.

    ``lr`` (the optimizer base lr) is the floor; the peak of cycle ``n`` is
    ``eta_max * gamma**n``.  Cycle ``n`` spans ``T_up + (T_0-T_up)*T_mult**n``
    steps: linear ramp for ``T_up``, cosine decay for the rest.
    """
    span0 = float(T_0 - T_up)

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)

        if T_mult == 1:
            cycle = jnp.floor(t / T_0)
            t_cur = t - cycle * T_0
            t_i = jnp.asarray(float(T_0), jnp.float32)
        else:
            # find cycle n: start(n) = n*T_up + span0*(mult^n - 1)/(mult-1)
            def cond(carry):
                n, _ = carry
                nxt = (n + 1) * T_up + span0 * (T_mult ** (n + 1) - 1) / (T_mult - 1)
                return nxt <= t

            def body(carry):
                n, _ = carry
                n = n + 1.0
                start = n * T_up + span0 * (T_mult ** n - 1) / (T_mult - 1)
                return n, start

            cycle, start = jax.lax.while_loop(
                cond, body, (jnp.asarray(0.0), jnp.asarray(0.0))
            )
            t_cur = t - start
            t_i = T_up + span0 * T_mult ** cycle

        peak = eta_max * gamma ** cycle
        warm = (peak - lr) * t_cur / max(T_up, 1) + lr
        cos_lr = lr + (peak - lr) * (
            1 + jnp.cos(jnp.pi * (t_cur - T_up) / (t_i - T_up))
        ) / 2
        return jnp.where(t_cur < T_up, warm, cos_lr)

    return schedule


_SCHEDULES = {
    "multi_step": multi_step,
    "cosine_annealing_warm_restarts": cosine_annealing_warm_restarts,
    "cosine_annealing_warm_up_restarts": cosine_annealing_warm_up_restarts,
    "yolo_lr": yolo_lr,
}


def get_scheduler(name: str, lr: float, **options) -> Schedule:
    """Build an LR schedule by registry name; None name -> constant lr."""
    if name is None:
        return lambda count: jnp.asarray(lr, jnp.float32)
    factory = _SCHEDULES.get(name)
    if factory is None:
        return None
    return factory(lr, **options)


# --------------------------------------------------------------------------
# Optimizers
# --------------------------------------------------------------------------

def _sgd(schedule, momentum=0.0, weight_decay=0.0, nesterov=False,
         dampening=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def _adam(schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def _adamw(schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
    )


def _radam(schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def _rmsprop(schedule, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


_OPTIMIZERS = {
    "sgd": _sgd,
    "adam": _adam,
    "radam": _radam,
    "adamw": _adamw,
    "rmsprop": _rmsprop,
}


def get_optimizer(name: str, lr: float = 1e-3, schedule: Schedule = None,
                  **options) -> optax.GradientTransformation:
    """Build an optax optimizer by registry name with torch-style kwargs.

    ``schedule`` overrides the constant ``lr`` (pass the result of
    ``get_scheduler``).  Unknown names return None, matching the reference
    registry's .get() behavior.
    """
    factory = _OPTIMIZERS.get(name)
    if factory is None:
        return None
    if schedule is None:
        schedule = lambda count: jnp.asarray(lr, jnp.float32)  # noqa: E731
    return factory(schedule, **options)


def freeze_subtrees(optimizer: optax.GradientTransformation,
                    frozen_names: Sequence[str]
                    ) -> optax.GradientTransformation:
    """Zero updates for top-level param subtrees named in ``frozen_names``
    (e.g. ['backbone']) -- the functional equivalent of the reference's
    set_parameter_requires_grad freeze helper (utils/utility.py:17-20),
    used for fine-tuning with a frozen trunk."""
    frozen = set(frozen_names)

    def labels(params):
        return {k: jax.tree_util.tree_map(
                    lambda _: "freeze" if k in frozen else "train", v)
                for k, v in params.items()}

    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels)


def build_optimizer_from_cfg(cfg: dict) -> tuple:
    """Construct (optimizer, schedule) from a flat experiment config dict.

    Mirrors the reference's configure_optimizers wiring including its
    fall-back to a bare optimizer when the scheduler keys are absent
    (reference: module/sbp_detector.py:47-71).
    """
    opt_options = dict(cfg.get("optimizer_options", {}))
    lr = opt_options.pop("lr", 1e-3)
    if "betas" in opt_options:
        opt_options["betas"] = tuple(opt_options["betas"])

    schedule = None
    if "scheduler" in cfg and "scheduler_options" in cfg:
        schedule = get_scheduler(cfg["scheduler"], lr, **cfg["scheduler_options"])
    if schedule is None:
        schedule = lambda count: jnp.asarray(lr, jnp.float32)  # noqa: E731

    opt = get_optimizer(cfg["optimizer"], lr=lr, schedule=schedule, **opt_options)
    if cfg.get("freeze"):
        opt = freeze_subtrees(opt, cfg["freeze"])
    return opt, schedule
