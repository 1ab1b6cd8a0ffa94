"""Config system: python-file configs, `_base_` inheritance, `${}` vars.

Capability parity with the reference's config machinery (mmcv `Config`
with `_base_` + `_delete_`, `tools/train_detr_ssod.py:63-73` --cfg-options
deep merge, and the custom `${var}` interpolation incl. dotted paths,
`detr_ssod/utils/vars.py:4-35`) plus the `semi_wrapper` -> `model` swap
(`detr_ssod/utils/patch.py:69-81`).

A config file is a python module defining plain dict/list/scalar globals.
`load_config` executes it, resolves `_base_` includes (later files win,
`_delete_=True` replaces instead of merging), then resolves `${a.b}`
string interpolation against the final tree.
"""
from __future__ import annotations

import copy
import os
import re
import runpy
from typing import Any, Dict, Optional, Sequence

_VAR_RE = re.compile(r"\$\{([\w.]+)\}")


def deep_merge(base: Dict, override: Dict) -> Dict:
    """mmcv-style merge: dicts merge recursively; `_delete_` in the
    override replaces the base subtree."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k == "_delete_":
            continue
        if (isinstance(v, dict) and isinstance(out.get(k), dict)
                and not v.get("_delete_", False)):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
            if isinstance(out[k], dict):
                out[k].pop("_delete_", None)
    return out


def _lookup(tree: Dict, dotted: str):
    cur: Any = tree
    for part in dotted.split("."):
        if isinstance(cur, dict):
            cur = cur[part]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(part)]
        else:
            cur = getattr(cur, part)
    return cur


def resolve_vars(tree: Dict, root: Optional[Dict] = None):
    """Resolve `${a.b.c}` in every string. A string that is exactly one
    `${...}` resolves to the referenced VALUE (any type); otherwise
    references are substituted textually (`vars.py:16-35`)."""
    root = tree if root is None else root

    def resolve(v):
        if isinstance(v, str):
            m = _VAR_RE.fullmatch(v)
            if m:
                return resolve(_lookup(root, m.group(1)))
            return _VAR_RE.sub(
                lambda mm: str(resolve(_lookup(root, mm.group(1)))), v)
        if isinstance(v, dict):
            return {k: resolve(x) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve(x) for x in v]
        if isinstance(v, tuple):
            return tuple(resolve(x) for x in v)
        return v

    return resolve(tree)


def _exec_config(path: str) -> Dict:
    mod = runpy.run_path(path)
    # drop dunder names, helper functions/classes and imported modules —
    # only data entries belong in the config tree
    return {k: v for k, v in mod.items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(os))}


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None,
                resolve: bool = True) -> Dict:
    """Load a config file with `_base_` inheritance + CLI overrides.

    overrides: {"a.b.c": value} dotted-path assignments
    (--cfg-options semantics).
    """
    raw = _exec_config(path)
    bases = raw.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    cfg: Dict = {}
    for b in bases:
        bpath = os.path.join(os.path.dirname(path), b)
        cfg = deep_merge(cfg, load_config(bpath, resolve=False))
    cfg = deep_merge(cfg, raw)

    if overrides:
        for dotted, value in overrides.items():
            set_by_path(cfg, dotted, value)
    if resolve:
        cfg = resolve_vars(cfg)
    return cfg


def set_by_path(tree: Dict, dotted: str, value: Any):
    parts = dotted.split(".")
    cur = tree
    parent, parent_key = None, None
    for p in parts[:-1]:
        if isinstance(cur, tuple):
            # tuples are immutable: replace with a list in the parent so
            # the indexed write below works
            cur = list(cur)
            parent[parent_key] = cur
        if isinstance(cur, list):
            parent, parent_key = cur, int(p)
            cur = cur[int(p)]
        else:
            parent, parent_key = cur, p
            cur = cur.setdefault(p, {})
    if isinstance(cur, tuple):
        cur = list(cur)
        parent[parent_key] = cur
    if isinstance(cur, list):
        cur[int(parts[-1])] = value
    else:
        cur[parts[-1]] = value


def parse_cfg_options(pairs: Sequence[str]) -> Dict[str, Any]:
    """['a.b=1', 'c=[1,2]'] -> {'a.b': 1, 'c': [1, 2]} with literal eval."""
    import ast
    out = {}
    for pair in pairs:
        key, _, val = pair.partition("=")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val
    return out


def apply_semi_wrapper(cfg: Dict) -> Dict:
    """The reference's SSOD activation: if `semi_wrapper` exists, it
    REPLACES `model` (`patch.py:76-78`) — the same train entry builds
    either a bare detector or the teacher-student wrapper."""
    if "semi_wrapper" in cfg:
        cfg = dict(cfg)
        cfg["model"] = cfg["semi_wrapper"]
    return cfg
