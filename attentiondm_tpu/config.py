"""Config system: YAML file -> nested namespace (reference main.py:231-239).

Same YAML schema as the reference's configs/*.yml (data / model / diffusion /
training / sampling / optim groups), resolved relative to the package's
``configs/`` directory when a bare filename is given.
"""
from __future__ import annotations

import argparse
import os

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def dict2namespace(config: dict) -> argparse.Namespace:
    namespace = argparse.Namespace()
    for key, value in config.items():
        if isinstance(value, dict):
            value = dict2namespace(value)
        setattr(namespace, key, value)
    return namespace


def namespace2dict(ns) -> dict:
    out = {}
    for k, v in vars(ns).items():
        out[k] = namespace2dict(v) if isinstance(v, argparse.Namespace) else v
    return out


def load_config(path: str) -> argparse.Namespace:
    """Load a YAML config; bare names resolve against the packaged configs/."""
    if not os.path.exists(path):
        candidate = os.path.join(CONFIG_DIR, path)
        if os.path.exists(candidate):
            path = candidate
    with open(path) as f:
        return dict2namespace(yaml.safe_load(f))
