"""AQLM additive codebook quantization (reference: vllm/model_executor/
layers/quantization/aqlm.py :157-376 and csrc/quantization/aqlm/
gemm_kernels.cu).

Checkpoint tensors per linear (out-major, as serialized by AQLM):
    codes      intN  [out/og, in/ig, num_codebooks]  signed storage
    codebooks  f16   [num_codebooks, 2**nbits, og, ig]
    scales     f16   [out/og, 1, 1, 1]

TPU-native execution: the CUDA codebook-GEMM has no MXU analogue —
random codebook lookups can't feed a systolic array. Instead the weight
is reconstructed ON DEVICE each forward with an XLA gather
(``jnp.take`` over the flattened codebooks, the TPU form of the
reference's ``F.embedding_bag(mode="sum")`` dequant, aqlm.py:58-65) and
fed to a dense bf16 MXU matmul. The gather is fused by XLA ahead of the
matmul; HBM cost equals a dense forward, which matches the reference's
own dequant-then-GEMM path for batched shapes (aqlm.py:76-90, chosen for
all prefill sizes). Codebook offsets are pre-added into ``codes`` at
load so the device does a single flat gather.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.linear import LinearMethod
from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)


class AQLMConfig(QuantizationConfig):

    def __init__(self, in_group_size: int, nbits_per_codebook: int,
                 num_codebooks: int, out_group_size: int) -> None:
        self.in_group_size = in_group_size
        self.nbits_per_codebook = nbits_per_codebook
        self.num_codebooks = num_codebooks
        self.out_group_size = out_group_size
        if out_group_size != 1:
            # same restriction as the reference (aqlm.py:176)
            raise ValueError("AQLM out_group_size != 1 is unsupported")

    @classmethod
    def get_name(cls) -> str:
        return "aqlm"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AQLMConfig":
        return cls(
            in_group_size=cls.get_from_keys(config, ["in_group_size"]),
            nbits_per_codebook=cls.get_from_keys(
                config, ["nbits_per_codebook"]),
            num_codebooks=cls.get_from_keys(config, ["num_codebooks"]),
            out_group_size=cls.get_from_keys(config, ["out_group_size"]),
        )

    def get_linear_method(self) -> "AQLMLinearMethod":
        return AQLMLinearMethod()

    # -- load-time conversion -------------------------------------------
    def quant_param_names(self) -> tuple:
        return ("codes", "codebooks", "scales")

    def wants(self, tensors: Dict[str, np.ndarray]) -> bool:
        return "codes" in tensors

    def convert_layer_params(
            self, tensors: Dict[str, np.ndarray],
            np_dtype, k_shards: int = 1) -> Dict[str, np.ndarray]:
        codes = tensors["codes"]
        codebooks = tensors["codebooks"].astype(np.float32)
        scales = tensors["scales"].astype(np.float32)
        cb, size, og, ig = codebooks.shape
        # signed storage -> unsigned index (reference unpack_int_data
        # aqlm.py:31-32), then pre-add per-codebook offsets for one flat
        # gather on device.
        idx = codes.astype(np.int64) % size
        idx = idx + (np.arange(cb, dtype=np.int64) * size)
        return {
            "codes": idx.astype(np.int32),          # [NO, NI, CB]
            "codebooks": codebooks.reshape(cb * size, og * ig),
            "oscales": scales.reshape(-1),          # [NO]
        }


class AQLMLinearMethod(LinearMethod):

    name = "aqlm"

    def partition_specs(self, mode: str) -> Dict[str, P]:
        if mode == "column":  # shard out axis
            return {"codes": P("model", None, None), "codebooks": P(),
                    "oscales": P("model"), "bias": P("model")}
        if mode == "row":  # shard in axis
            return {"codes": P(None, "model", None), "codebooks": P(),
                    "oscales": P(), "bias": P()}
        return {"codes": P(), "codebooks": P(), "oscales": P(),
                "bias": P()}

    def apply(self, params: Dict[str, jax.Array],
              x: jax.Array) -> jax.Array:
        codes = params["codes"]            # [NO, NI, CB] offset indices
        lut = params["codebooks"]          # [CB*S, og*ig]
        oscales = params["oscales"]        # [NO]
        no, ni, cb = codes.shape
        og_ig = lut.shape[1]
        ig = og_ig  # out_group_size == 1
        w = jnp.take(lut, codes, axis=0)   # [NO, NI, CB, ig]
        w = w.sum(axis=2)                  # additive codebooks
        w = w * oscales[:, None, None]
        w = w.reshape(no, ni * ig)         # [out, in]
        out = jnp.dot(x.astype(jnp.float32), w.T.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
