"""Model-parameter checkpoint IO: torch .pt, flat .npz, and orbax.

Sampling must load all the checkpoint families the reference can
(reference scripts/sample.py:43: torch state dicts, both raw-OpenAI and
converted naming) plus this framework's own formats.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import numpy as np

from .convert import load_torch_checkpoint

__all__ = ["load_params", "save_params_npz"]

_SEP = "::"


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[_SEP.join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(params, path: str) -> None:
    """Save a flax params pytree as a flat .npz archive."""
    np.savez(path, **_flatten(jax.tree.map(np.asarray, params)))


def load_params(path: str) -> dict:
    """Load model params from .pt (torch, converting layouts), .npz (ours),
    or an orbax checkpoint directory (ours; returns its 'params' entry)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return restored["params"] if "params" in restored else restored
    if path.endswith(".npz"):
        with np.load(path) as data:
            return _unflatten({k: data[k] for k in data.files})
    if path.endswith((".pt", ".pth", ".ckpt")):
        return load_torch_checkpoint(path)
    raise ValueError(f"unrecognised checkpoint format: {path}")
