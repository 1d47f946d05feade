"""YAML experiment-config loading.

Mirrors the reference's config surface (reference: utils/yaml_helper.py:22-30):
flat-dict YAML files loaded with a SafeLoader patched so scientific-notation
scalars like ``1e-3`` parse as floats (stock PyYAML 1.1 parses them as
strings).  ``make_model_name`` reproduces utils/utility.py:13.
"""

from __future__ import annotations

import re

import yaml


class _ConfigLoader(yaml.SafeLoader):
    """SafeLoader subclass so the resolver patch stays local to this module."""


# YAML 1.1's float regex requires a digit after the '.', so '1e-3' is a str.
# Register a resolver that accepts full scientific notation.
_ConfigLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:
         [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def load_yaml_file(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.load(f, Loader=_ConfigLoader)


def get_configs(path: str) -> dict:
    """Load a flat experiment config dict from a YAML file."""
    return load_yaml_file(path)


def make_model_name(cfg: dict) -> str:
    """Log/checkpoint directory name: '<model>_<dataset_name>'."""
    return cfg["model"] + "_" + cfg["dataset_name"]
