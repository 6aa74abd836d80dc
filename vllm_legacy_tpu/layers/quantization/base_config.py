"""Quantization config ABC (reference: vllm/model_executor/layers/
quantization/base_config.py :8,34)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional

from vllm_legacy_tpu.layers.linear import LinearMethod


class QuantizationConfig(ABC):

    @classmethod
    @abstractmethod
    def get_name(cls) -> str:
        ...

    @classmethod
    @abstractmethod
    def from_config(cls, config: Dict[str, Any]) -> "QuantizationConfig":
        ...

    @classmethod
    def get_from_keys(cls, config: Dict[str, Any],
                      keys: List[str]) -> Any:
        for key in keys:
            if key in config:
                return config[key]
        raise ValueError(f"Cannot find any of {keys} in the model's "
                         "quantization config.")

    @abstractmethod
    def get_linear_method(self) -> LinearMethod:
        """The LinearMethod applying this scheme (may be the Pallas
        fused dequant-matmul or a dequant-at-load passthrough)."""
        ...

    def get_scaled_act_names(self) -> List[str]:
        return []

    # -- load-time conversion protocol ----------------------------------
    # Model loaders call wants() on each per-projection tensor dict and
    # replace it with convert_layer_params() when it matches (replaces
    # the reference's per-method create_weights/process_weights_after_
    # loading pairs).

    def wants(self, tensors: Dict[str, Any]) -> bool:
        """Does this projection's checkpoint tensor dict need
        conversion? Default: groupwise packed checkpoints (GPTQ/AWQ
        qweight)."""
        return "qweight" in tensors

    def convert_layer_params(self, tensors: Dict[str, Any],
                             np_dtype,
                             k_shards: int = 1) -> Dict[str, Any]:
        """Repack one projection's tensors into device-ready params.
        Default: the common TPU packed-groupwise layout. ``k_shards`` is
        the row-parallel TP degree for this linear — packed K is padded
        per shard so each shard's K tiles divide exactly."""
        return self.convert_layer(tensors).as_params(k_shards=k_shards)

    def dummy_packed_params(self, k: int, n: int, rng,
                            k_shards: int = 1) -> Dict[str, Any]:
        """Device-ready random params for one [k, n] linear — the
        quantized analogue of DummyModelLoader (reference
        model_loader/loader.py:261): lets benchmarks/tests run the real
        fused dequant-GEMM path at full model scale without a
        checkpoint. Default: the common packed-groupwise layout
        (common.py). Values are uniform nibbles around the zero point so
        dequantized weights look like N(0, ~0.02) init noise."""
        import numpy as np

        from vllm_legacy_tpu.layers.quantization.common import (
            PackedQuantParams)
        method = self.get_linear_method()
        bits = getattr(method, "bits", 4)
        group = getattr(method, "group_size", 128) or 128
        if group <= 0:  # -1 = one group over the whole contraction
            group = k
        n_groups = max(k // group, 1)
        # one shared random byte pool, viewed per call — generating
        # fresh bytes for 7B params takes tens of seconds on host
        pool = rng.randint(0, 256, size=1 << 22).astype(np.uint8)

        def bytes_tiled(shape, signed=False):
            size = int(np.prod(shape))
            reps = size // pool.size + 1
            out = np.tile(pool, reps)[:size].reshape(shape)
            return (out.view(np.int8) if signed else out).copy()

        if bits == 4:
            qweight = bytes_tiled((k // 2, n))
            zero = 7.5  # mean nibble
        else:
            qweight = bytes_tiled((k, n), signed=True)
            zero = -0.5
        scale = 0.005
        scales = np.full((n_groups, n), scale, np.float32)
        szeros = np.full((n_groups, n), scale * zero, np.float32)
        return PackedQuantParams(qweight, scales, szeros, bits,
                                 group).as_params(k_shards=k_shards)
