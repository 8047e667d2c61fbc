"""PyTorch checkpoint -> flax parameter-pytree converter.

The reference loads three families of torch checkpoints (reference
scripts/sample.py:43, trainer.py:48-50): its own EMNIST/`Trainer` state
dicts, "converted" OpenAI guided-diffusion checkpoints, and raw OpenAI
checkpoints after the rename map at reference utils.py:265-292. This module
reproduces that rename map AND performs the NCHW->NHWC layout transposes the
torch implementation never needed:

  * Conv2d  weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  * Conv1d  weight (O, I, 1)      -> Dense kernel (I, O)   [qkv_nin/proj_out]
  * Linear  weight (O, I)         -> Dense kernel (I, O)
  * GroupNorm weight/bias         -> scale/bias
  * Embedding weight              -> embedding

Torch module paths map mechanically onto the flax module tree built by
nicediffusion_tpu.models.unet (``downsampling.{i}.{j}.*`` ->
``downsampling_{i}.layers_{j}.*`` etc.). torch is used only as an offline
host-side unpickler — nothing here touches the device path.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

# rename bare `qkv` -> `qkv_nin` but leave `qkv_nin` (idempotence) and the
# attention pool's `qkv_proj` (classifier checkpoints) untouched
_QKV_RE = re.compile(r"qkv(?!_nin|_proj)")

__all__ = [
    "rename_guided_diffusion_keys",
    "convert_torch_state_dict",
    "load_torch_checkpoint",
    "flax_params_to_torch_state_dict",
    "export_torch_checkpoint",
]

# Containers whose integer-indexed torch children become flax ``layers_{j}``
# children of the *same-named* flax module (nn.Sequential analogues).
_SEQ_CONTAINERS = {"step_embed", "out", "middle_block"}
# Containers whose integer-indexed torch children become separate flax
# modules named ``{container}_{i}`` (nn.ModuleList analogues), each of which
# is a StepSequential with ``layers_{j}`` children.
_LIST_CONTAINERS = {"downsampling", "upsampling"}


def rename_guided_diffusion_keys(name: str) -> str:
    """Rename a raw OpenAI guided-diffusion parameter name to the reference's
    naming (reference utils.py:265-292). A no-op for already-converted names.
    """
    for old, new in (
        ("input_blocks", "downsampling"),
        ("output_blocks", "upsampling"),
        ("in_layers.0", "in_norm"),
        ("in_layers.2", "in_conv"),
        ("emb_layers.1", "step_embedding"),
        ("out_layers.0", "out_norm"),
        ("out_layers.3", "out_conv"),
        ("skip_connection", "skip"),
        ("time_embed", "step_embed"),
        ("label_emb", "class_embedding"),
    ):
        name = name.replace(old, new)
    # qkv -> qkv_nin, made idempotent (already-converted reference
    # checkpoints use qkv_nin; a naive replace would yield qkv_nin_nin).
    name = _QKV_RE.sub("qkv_nin", name)
    return name


def _flax_path(torch_name: str) -> tuple[list[str], str]:
    """Translate a torch parameter path to (flax module path, leaf name).

    e.g. 'downsampling.3.0.in_norm.weight'
         -> (['downsampling_3', 'layers_0', 'in_norm'], 'weight')
    """
    parts = torch_name.split(".")
    leaf = parts[-1]
    parts = parts[:-1]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _LIST_CONTAINERS:
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
            if i < len(parts) and parts[i].isdigit():
                out.append(f"layers_{parts[i]}")
                i += 1
        elif p in _SEQ_CONTAINERS:
            out.append(p)
            i += 1
            if i < len(parts) and parts[i].isdigit():
                out.append(f"layers_{parts[i]}")
                i += 1
        else:
            out.append(p)
            i += 1
    return out, leaf


def _convert_leaf(path: list[str], leaf: str, value: np.ndarray):
    """Transpose/rename one torch tensor into its flax (name, array) form."""
    module = path[-1] if path else ""
    if leaf == "bias":
        return "bias", value
    if leaf == "positional_embedding":
        # AttentionPool2d stores (C, N+1); flax uses token-major (N+1, C)
        return "positional_embedding", value.T
    assert leaf == "weight", f"unexpected leaf {leaf} at {'.'.join(path)}"
    if module == "class_embedding":
        return "embedding", value
    if value.ndim == 4:  # Conv2d OIHW -> HWIO
        return "kernel", value.transpose(2, 3, 1, 0)
    if value.ndim == 3:  # Conv1d (O, I, 1) -> Dense (I, O)
        return "kernel", value[:, :, 0].T
    if value.ndim == 2:  # Linear (O, I) -> Dense (I, O)
        return "kernel", value.T
    if value.ndim == 1:  # GroupNorm weight -> scale
        return "scale", value
    raise ValueError(f"cannot convert {'.'.join(path)}.{leaf} shape {value.shape}")


def convert_torch_state_dict(sd: Mapping[str, Any]) -> dict:
    """Convert a torch state dict (name -> tensor/ndarray) to a flax params
    pytree matching nicediffusion_tpu.models.DiffusionModel."""
    params: dict = {}
    for name, tensor in sd.items():
        value = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        name = rename_guided_diffusion_keys(name)
        path, leaf = _flax_path(name)
        leaf, value = _convert_leaf(path, leaf, value)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pt`` state dict from disk and convert it.

    torch is imported lazily — it is an offline conversion dependency only.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd)


def export_torch_checkpoint(params: dict, path: str) -> None:
    """Write a flax params pytree as a torch ``.pt`` state dict loadable by
    the reference with ``strict=True`` (reference sample.py:43) — full
    round-trip interop in both directions."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_params_to_torch_state_dict(params).items()
    }
    torch.save(sd, path)


def flax_params_to_torch_state_dict(params: dict) -> dict:
    """Inverse conversion (flax pytree -> torch-style state dict of numpy
    arrays), for exporting checkpoints back to the reference format."""
    out: dict[str, np.ndarray] = {}

    def emit(path: list[str], node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                emit(path + [k], v)
            return
        value = np.asarray(node)
        *mods, leaf = path
        torch_mods = []
        for m in mods:
            stem, _, idx = m.rpartition("_")
            if stem in _LIST_CONTAINERS and idx.isdigit():
                torch_mods += [stem, idx]
            elif stem == "layers" and idx.isdigit():
                torch_mods.append(idx)
            else:
                torch_mods.append(m)
        if leaf == "scale":
            name, value = "weight", value
        elif leaf == "embedding":
            name, value = "weight", value
        elif leaf == "positional_embedding":
            name, value = "positional_embedding", value.T  # back to (C, N+1)
        elif leaf == "kernel":
            name = "weight"
            if value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)
            elif mods and mods[-1] in ("qkv_nin", "proj_out", "qkv_proj", "c_proj"):
                value = value.T[:, :, None]  # Dense -> Conv1d (O, I, 1)
            else:
                value = value.T
        else:
            name = leaf
        out[".".join(torch_mods + [name])] = value

    emit([], params)
    return out
