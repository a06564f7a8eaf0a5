"""Small host-side IO helpers (reference: thinkdiff/common/utils.py)."""

from __future__ import annotations

import datetime
import json
import os
from typing import Any

import numpy as np
import yaml

from thinkdiff_tpu.core.registry import registry


def now() -> str:
    """Job-id timestamp (reference utils.py:35-38)."""
    return datetime.datetime.now().strftime("%Y%m%d%H%M")[:-1]


def get_cache_path(rel_path: str) -> str:
    return os.path.expanduser(os.path.join(registry.get_path("cache_root"), rel_path))


def get_abs_path(rel_path: str) -> str:
    return os.path.join(registry.get_path("library_root"), rel_path)


def makedir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str, indent=None) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def load_yaml_file(path: str) -> Any:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_yaml_file(obj: Any, path: str) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def save_npy(arr: np.ndarray, path: str) -> None:
    makedir(os.path.dirname(os.path.abspath(path)))
    np.save(path, arr)


def load_npy(path: str) -> np.ndarray:
    return np.load(path)
