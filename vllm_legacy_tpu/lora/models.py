"""LoRA checkpoint loading + slot management.

Reference: ``vllm/lora/models.py`` (LoRAModel.from_local_checkpoint
:272, LRUCacheLoRAModelManager :731) and ``vllm/lora/worker_manager.py``.
Adapters live stacked on device: per target projection one
``[max_loras, in, r_max]`` A and ``[max_loras, r_max, out]`` B array;
activating an adapter copies its (rank-padded) matrices into a slot row.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.lora.request import LoRARequest

logger = init_logger(__name__)

# HF/peft target-module name -> our per-layer param key
_TARGET_MAP = {
    "q_proj": "q_proj",
    "k_proj": "k_proj",
    "v_proj": "v_proj",
    "o_proj": "o_proj",
    "gate_proj": "gate_proj",
    "up_proj": "up_proj",
    "down_proj": "down_proj",
}


class LoRAModel:
    """One loaded adapter: {(layer, proj): (A [in, r], B [r, out])}."""

    def __init__(self, lora_id: int, rank: int, scaling: float,
                 tensors: Dict[Tuple[int, str],
                               Tuple[np.ndarray, np.ndarray]]) -> None:
        self.id = lora_id
        self.rank = rank
        self.scaling = scaling
        self.tensors = tensors

    @classmethod
    def from_local_checkpoint(cls, path: str,
                              lora_id: int) -> "LoRAModel":
        cfg_path = os.path.join(path, "adapter_config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        rank = cfg["r"]
        alpha = cfg.get("lora_alpha", rank)
        scaling = alpha / rank
        # long-context adapters carry their rope scaling (reference:
        # LongContextLoRAContext, lora/models.py:29 + lora/layers.py
        # LinearScalingRotaryEmbeddingWithLora)
        rs = cfg.get("rope_scaling") or {}
        scaling_factor = (float(rs["factor"])
                          if isinstance(rs, dict) and rs.get("factor")
                          else None)
        context_length = cfg.get("context_length")

        tensor_file = None
        for name in ("adapter_model.safetensors", "adapter_model.bin"):
            p = os.path.join(path, name)
            if os.path.isfile(p):
                tensor_file = p
                break
        if tensor_file is None:
            raise ValueError(f"No adapter weights found in {path}")

        raw: Dict[str, np.ndarray] = {}
        if tensor_file.endswith(".safetensors"):
            from safetensors import safe_open
            with safe_open(tensor_file, framework="pt") as sf:
                for name in sf.keys():
                    raw[name] = sf.get_tensor(name).float().numpy()
        else:
            import torch
            state = torch.load(tensor_file, map_location="cpu",
                               weights_only=True)
            raw = {k: v.float().numpy() for k, v in state.items()}

        tensors: Dict[Tuple[int, str],
                      Tuple[np.ndarray, np.ndarray]] = {}
        partial: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}
        for name, w in raw.items():
            # e.g. base_model.model.model.layers.0.self_attn.q_proj.
            #      lora_A.weight  -> peft layout [r, in] / [out, r]
            parts = name.split(".")
            if "layers" not in parts:
                continue
            li = parts.index("layers")
            layer = int(parts[li + 1])
            proj = None
            for p_ in parts:
                if p_ in _TARGET_MAP:
                    proj = _TARGET_MAP[p_]
            if proj is None:
                continue
            kind = "a" if "lora_A" in name else "b"
            partial.setdefault((layer, proj), {})[kind] = w
        for key, ab in partial.items():
            if "a" in ab and "b" in ab:
                tensors[key] = (ab["a"].T, ab["b"].T)  # [in,r], [r,out]
        model = cls(lora_id, rank, scaling, tensors)
        model.scaling_factor = scaling_factor
        model.context_length = context_length
        return model


class LoRAManager:
    """Stacked device buffers + slot LRU (reference: LoRAModelManager
    :367 / worker_manager.py)."""

    def __init__(self, model, max_loras: int, max_rank: int,
                 dtype=jnp.bfloat16,
                 long_scaling_factors=None) -> None:
        self.model = model
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.dtype = dtype
        self._loaded: Dict[int, LoRAModel] = {}
        self._slot_of: Dict[int, int] = {}
        self._slot_lru: List[int] = []  # lora ids, LRU order
        # stacked arrays, built lazily per (layer, proj)
        self.stacks: Dict[Tuple[int, str], Dict[str, Any]] = {}
        self.scaling = np.zeros((max_loras, ), np.float32)

        # long-context LoRA: a multi-segment rope cache (one segment per
        # declared scaling factor, reference: LinearScalingRotary-
        # Embedding multi-offset, rotary_embedding.py:192) + per-slot
        # position offsets into it.
        self.max_position = getattr(model, "max_position", None)
        self.slot_rope_offset = np.zeros((max_loras, ), np.int64)
        self.rope_offset_of: Dict[float, int] = {1.0: 0}
        self.extended_rope_cache = None
        if long_scaling_factors:
            if getattr(model, "rope_scaling", None):
                raise ValueError(
                    "long_lora_scaling_factors compose with an unscaled "
                    "base rope only (the adapter brings the scaling)")
            from vllm_legacy_tpu.layers.rotary import build_cos_sin_cache
            segs = [model.make_rope_cache()]
            off = segs[0].shape[0]
            for f in sorted({float(x) for x in long_scaling_factors}):
                if f == 1.0:
                    continue
                # the linear branch sizes the cache to max_position * f
                # itself (layers/rotary.py:51-53)
                seg = build_cos_sin_cache(
                    model.head_dim, model.rotary_dim,
                    self.max_position, model.rope_theta,
                    {"type": "linear", "factor": f})
                self.rope_offset_of[round(f, 4)] = off
                off += seg.shape[0]
                segs.append(seg)
            self.extended_rope_cache = np.concatenate(segs, axis=0)

    def _ensure_stack(self, layer: int, proj: str, in_dim: int,
                      out_dim: int) -> Dict[str, Any]:
        key = (layer, proj)
        if key not in self.stacks:
            self.stacks[key] = {
                "a": np.zeros((self.max_loras, in_dim, self.max_rank),
                              np.float32),
                "b": np.zeros((self.max_loras, self.max_rank, out_dim),
                              np.float32),
            }
        return self.stacks[key]

    def activate(self, request: LoRARequest) -> int:
        """Load (if needed) and pin the adapter; returns its slot."""
        lid = request.lora_int_id
        if lid in self._slot_of:
            self._slot_lru.remove(lid)
            self._slot_lru.append(lid)
            return self._slot_of[lid]
        if lid not in self._loaded:
            self._loaded[lid] = LoRAModel.from_local_checkpoint(
                request.lora_local_path, lid)
        lora = self._loaded[lid]
        if lora.rank > self.max_rank:
            raise ValueError(
                f"LoRA rank {lora.rank} > max_lora_rank {self.max_rank}")

        if len(self._slot_lru) >= self.max_loras:
            evicted = self._slot_lru.pop(0)
            slot = self._slot_of.pop(evicted)
        else:
            slot = len(self._slot_lru)
        self._slot_of[lid] = slot
        self._slot_lru.append(lid)
        self.scaling[slot] = lora.scaling
        factor = getattr(lora, "scaling_factor", None)
        if factor is None and getattr(lora, "context_length", None) \
                and self.max_position:
            factor = lora.context_length / self.max_position
        factor = round(factor or 1.0, 4)
        if factor != 1.0:
            off = self.rope_offset_of.get(factor)
            if off is None:
                raise ValueError(
                    f"adapter {lid} needs rope scaling factor {factor} "
                    "— declare it in --long-lora-scaling-factors")
            self.slot_rope_offset[slot] = off
        else:
            self.slot_rope_offset[slot] = 0

        # clear the ENTIRE slot first: an evicted adapter may have
        # occupied (layer, proj) stacks the new one doesn't touch, and
        # stale rows would be applied with the new adapter's scaling
        for stack in self.stacks.values():
            stack["a"][slot] = 0.0
            stack["b"][slot] = 0.0
        for (layer, proj), (a, b) in lora.tensors.items():
            stack = self._ensure_stack(layer, proj, a.shape[0],
                                       b.shape[1])
            stack["a"][slot] = 0.0
            stack["b"][slot] = 0.0
            stack["a"][slot, :, :a.shape[1]] = a
            stack["b"][slot, :b.shape[0], :] = b
        self._device_stale = True
        return slot

    def slot_for(self, request: Optional[LoRARequest]) -> int:
        if request is None:
            return -1
        return self._slot_of.get(request.lora_int_id, -1)

    def device_lora_params(self) -> Dict[str, Any]:
        """Pytree merged into model params: layers[i][proj] gains
        lora_a/lora_b/lora_scale entries."""
        layers: List[Dict[str, Any]] = [
            dict() for _ in range(self.model.num_layers)
        ]
        for (layer, proj), stack in self.stacks.items():
            layers[layer][proj] = {
                "lora_a": jnp.asarray(stack["a"], self.dtype),
                "lora_b": jnp.asarray(stack["b"], self.dtype),
                "lora_scale": jnp.asarray(self.scaling),
            }
        out = {"layers": layers}
        if self.extended_rope_cache is not None:
            out["rope_cache"] = jnp.asarray(self.extended_rope_cache)
        return out

    def rope_offsets_for(self, slots: List[int]) -> List[int]:
        """Per-row rope-cache position offsets (0 for base / no lora)."""
        return [
            int(self.slot_rope_offset[s]) if s >= 0 else 0
            for s in slots
        ]
