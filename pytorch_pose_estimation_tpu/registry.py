"""Name -> factory registries (reference: utils/module_select.py:7-35).

``get_model`` resolves backbone names; optimizers/schedulers live in
``optim`` and are re-exported here so the CLI surface matches the reference.
"""

from __future__ import annotations

from .models.darknet import darknet19
from .optim import get_optimizer, get_scheduler  # noqa: F401  (re-export)

_MODELS = {
    "darknet19": darknet19,
}


def get_model(model_name: str):
    return _MODELS.get(model_name)


def register_model(name: str, factory) -> None:
    _MODELS[name] = factory
