"""Python-module config system.

Same public semantics as the reference config parser
(``/root/reference/spectre_vit/configs/parser.py:5-27``): a config is a plain
Python module of top-level constants; ``parse_config(path)`` returns a
``SimpleNamespace``. Two reference defects are fixed here (SURVEY.md §2/§7,
"preserve the feature, not the bug"):

- merge direction: the reference merges ``mod |= base_mod`` so the *base*
  silently overrides the child (parser.py:25). Here the child always wins.
- key mismatch: the reference honors only ``__base__`` while six of its eight
  configs declare ``_base_`` (e.g. vit_cifar100.py:1), which was silently
  ignored. Here both spellings are honored, as a string or a list of strings,
  with recursive inheritance.

Configs are loaded by *file path* (exec'd), not import path, so they work from
any CWD and never pollute ``sys.modules``.
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Any

_BASE_KEYS = ("__base__", "_base_")


def _exec_config_file(path: str) -> dict[str, Any]:
    path = os.path.abspath(path)
    if not path.endswith(".py"):
        path += ".py"
    with open(path, "r") as f:
        src = f.read()
    namespace: dict[str, Any] = {"__file__": path, "__name__": "__config__"}
    exec(compile(src, path, "exec"), namespace)
    return namespace


def module_to_dict(namespace: dict[str, Any]) -> dict[str, Any]:
    """Keep non-underscore top-level names, plus the base-inheritance keys.

    Mirrors the reference's ``module_to_dict`` (parser.py:5-6) but also admits
    ``_base_``.
    """
    out = {}
    for k, v in namespace.items():
        if not k.startswith("_") or k in _BASE_KEYS:
            out[k] = v
    return out


def _load_config_dict(path: str, _seen: frozenset[str] = frozenset()) -> dict[str, Any]:
    abspath = os.path.abspath(path if path.endswith(".py") else path + ".py")
    if abspath in _seen:
        raise ValueError(f"circular config inheritance at {abspath}")
    cfg = module_to_dict(_exec_config_file(abspath))

    bases: list[str] = []
    for key in _BASE_KEYS:
        declared = cfg.pop(key, None)
        if declared is None:
            continue
        if isinstance(declared, str):
            declared = [declared]
        bases.extend(declared)

    merged: dict[str, Any] = {}
    cfg_dir = os.path.dirname(abspath)
    for base in bases:
        base_path = os.path.join(cfg_dir, base)
        merged.update(_load_config_dict(base_path, _seen | {abspath}))
    merged.update(cfg)  # child wins
    return merged


def parse_config(config_path: str) -> SimpleNamespace:
    """Load a python config file (with base inheritance) into a namespace.

    Public API compatible with the reference ``parse_config`` (parser.py:9-27)
    — accepts either a filesystem path (``spectre_tpu/configs/foo.py``) or the
    reference's slash-path convention, returns a ``SimpleNamespace``.
    """
    return SimpleNamespace(**_load_config_dict(config_path))


def config_to_dict(config: SimpleNamespace) -> dict[str, Any]:
    return dict(vars(config))
