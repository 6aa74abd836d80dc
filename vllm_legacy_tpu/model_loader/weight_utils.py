"""Checkpoint iteration utilities (reference: vllm/model_executor/
model_loader/weight_utils.py — HF download + safetensors/bin iteration
:116-260). Downloads go through huggingface_hub if the model is not a
local path; tensors are yielded as numpy arrays on host."""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)


def _torch_to_numpy(t) -> np.ndarray:
    import ml_dtypes
    import torch
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def resolve_weight_files(model_path: str,
                         load_format: str = "auto") -> Tuple[List[str], str]:
    """Find checkpoint files for a local dir or HF repo id."""
    if not os.path.isdir(model_path):
        from huggingface_hub import snapshot_download
        model_path = snapshot_download(model_path)
    st = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st and load_format in ("auto", "safetensors"):
        return st, "safetensors"
    bins = sorted(glob.glob(os.path.join(model_path, "*.bin")))
    if bins and load_format in ("auto", "pt"):
        return bins, "pt"
    pth = sorted(glob.glob(os.path.join(model_path, "*.pth")))
    if pth and load_format in ("auto", "pt"):
        return pth, "pt"
    raise ValueError(f"No checkpoint files found in {model_path}")


def iterate_weights(
        files: List[str],
        fmt: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, numpy array) for every tensor in the checkpoint."""
    if fmt == "safetensors":
        from safetensors import safe_open
        for f in files:
            with safe_open(f, framework="pt") as sf:
                for name in sf.keys():
                    yield name, _torch_to_numpy(sf.get_tensor(name))
    else:
        import torch
        for f in files:
            state = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in state.items():
                yield name, _torch_to_numpy(t)


def get_quant_config_from_checkpoint(
        model_path: str) -> Optional[Dict[str, Any]]:
    """Sniff HF quantization_config (reference: weight_utils.py
    get_quant_config :118 + config.py:162-220 auto-override)."""
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.isfile(cfg_path):
        return None
    with open(cfg_path) as f:
        cfg = json.load(f)
    return cfg.get("quantization_config")
