"""Pre-converted checkpoint save/load (reference: ShardedStateLoader,
model_loader/loader.py:384 + worker.save_sharded_state worker.py:123).

The reference saves per-TP-rank shards to skip resharding on reload;
under a single-controller mesh the analogous win is saving the
POST-PROCESSED param pytree — vocab padding, quant-layout conversion,
fused-weight splits and transposes all done — so reload is a straight
mmap-read instead of re-running load_weights (minutes for int4 70B).

Format: one .npz per save (bf16 stored as uint16 bit patterns) + a JSON
manifest recording each leaf's dtype and the tree structure.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

MANIFEST = "vlt_sharded_state.json"
ARRAYS = "vlt_sharded_state.npz"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out


def save_params(params: Any, path: str) -> None:
    import jax
    os.makedirs(path, exist_ok=True)
    host = jax.device_get(params)
    flat = _flatten(host)
    dtypes = {}
    arrays = {}
    for name, arr in flat.items():
        arr = np.asarray(arr)
        dtypes[name] = str(arr.dtype)
        if arr.dtype.name == "bfloat16":
            arr = arr.view(np.uint16)
        arrays[name] = arr
    np.savez(os.path.join(path, ARRAYS), **arrays)
    structure = json.loads(json.dumps(_structure(host)))
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({"dtypes": dtypes, "structure": structure}, f)


def _structure(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _structure(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_structure(v) for v in tree]
    return None  # leaf


def is_sharded_state_checkpoint(path: str) -> bool:
    return os.path.isfile(os.path.join(path, MANIFEST))


def load_params(path: str) -> Dict[str, Any]:
    import ml_dtypes
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, ARRAYS))

    def rebuild(node: Any, prefix: str = ""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v, f"{prefix}{i}.")
                    for i, v in enumerate(node)]
        name = prefix[:-1]
        arr = data[name]
        if manifest["dtypes"][name] == "bfloat16":
            arr = arr.view(ml_dtypes.bfloat16)
        return arr

    return rebuild(manifest["structure"])
