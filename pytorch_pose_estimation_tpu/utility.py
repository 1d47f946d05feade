"""Misc utilities (reference: utils/utility.py:3-20)."""

from __future__ import annotations

from .config import make_model_name  # noqa: F401  (re-export)
from .optim import freeze_subtrees as set_parameter_requires_grad  # noqa: F401


def make_divisible(v, divisor: int = 8, min_value=None) -> int:
    """Round a channel count to a hardware-friendly multiple, never dropping
    more than 10% (the standard MobileNet-style rule)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
