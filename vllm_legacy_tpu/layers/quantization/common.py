"""Common TPU packed layout + the quantized LinearMethod.

Every weight-only groupwise scheme lands here after load-time repacking:

    qweight  uint8 [K/2, N]  (4-bit: in-rows 2r/2r+1 in low/high nibble)
             int8  [K, N]    (8-bit)
    scales   f32 [K/group, N]
    szeros   f32 [K/group, N]  — scale * zero pre-multiplied, so kernel
                                 dequant is q*scale - szero

Replaces the reference's per-method param layouts (gptq.py:134-196
qweight/qzeros/scales/g_idx, awq.py packed columns, marlin repack
csrc/quantization/gptq_marlin/) with one layout for one kernel.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.layers.linear import LinearMethod


def unpack_int32_nibbles(packed: np.ndarray, axis: int) -> np.ndarray:
    """int32 array packing 8 x 4-bit values along `axis` -> uint8 array
    of nibble values (0..15) with that axis expanded 8x."""
    p = packed.astype(np.uint32)
    parts = [((p >> (4 * i)) & 0xF).astype(np.uint8) for i in range(8)]
    return np.stack(parts, axis=axis + 1).reshape(
        *packed.shape[:axis],
        packed.shape[axis] * 8,
        *packed.shape[axis + 1:],
    )


def pack_rows_to_bytes(q: np.ndarray) -> np.ndarray:
    """uint8 nibble values [K, N] -> packed uint8 [K/2, N]; byte row r
    holds in-row 2r in the low nibble and 2r+1 in the high nibble
    (matches the kernel unpack in ops/pallas/quant_matmul.py)."""
    assert q.shape[0] % 2 == 0
    lo = q[0::2]
    hi = q[1::2]
    return (lo | (hi << 4)).astype(np.uint8)


class PackedQuantParams:
    """Host-side repacked params for one linear layer."""

    def __init__(self, qweight: np.ndarray, scales: np.ndarray,
                 szeros: np.ndarray, bits: int, group_size: int,
                 in_perm: Optional[np.ndarray] = None) -> None:
        self.qweight = qweight
        self.scales = scales
        self.szeros = szeros
        self.bits = bits
        self.group_size = group_size
        # act-order (GPTQ desc_act): runtime gather of x columns
        self.in_perm = in_perm

    def as_params(self, k_shards: int = 1) -> Dict[str, np.ndarray]:
        """Device-ready dict, with K padded so each of the ``k_shards``
        row-parallel shards is a whole number of kernel K tiles
        (quant_matmul.quant_k_tile: 8 groups, sublane-aligned scales
        blocks); apply() zero-pads x to match, so padded rows contribute
        nothing to the dot."""
        from vllm_legacy_tpu.ops.pallas.quant_matmul import quant_k_tile
        qweight, scales, szeros = (self.qweight,
                                   self.scales.astype(np.float32),
                                   self.szeros.astype(np.float32))
        rows_per_k = 2 if self.bits == 4 else 1
        k = qweight.shape[0] * rows_per_k
        group = self.group_size if self.group_size > 0 else k
        if k_shards > 1 and (k // k_shards) % group != 0:
            raise ValueError(
                f"row-parallel TP over {k_shards} shards needs the "
                f"per-shard K ({k}/{k_shards}) to be a multiple of the "
                f"quant group size {group} (same constraint as the "
                "reference's GPTQLinearMethod input alignment)")
        # pad each shard's K segment to a whole number of kernel K
        # tiles; the pad sits at each shard's tail (TP splits K
        # contiguously), and apply() zero-pads the local x to match.
        k_loc = k // k_shards
        k_loc_new = k_loc if k_loc // group < 8 \
            else -(-k_loc // (8 * group)) * (8 * group)
        assert k_loc_new % quant_k_tile(k_loc_new, group) == 0
        pad_loc = k_loc_new - k_loc
        if pad_loc:
            def pad_segments(a: np.ndarray, seg: int, pad: int):
                a = a.reshape(k_shards, seg, *a.shape[1:])
                a = np.pad(a, ((0, 0), (0, pad)) + ((0, 0), ) *
                           (a.ndim - 2))
                return a.reshape(k_shards * (seg + pad), *a.shape[2:])

            qweight = pad_segments(qweight, k_loc // rows_per_k,
                                   pad_loc // rows_per_k)
            scales = pad_segments(scales, k_loc // group,
                                  pad_loc // group)
            szeros = pad_segments(szeros, k_loc // group,
                                  pad_loc // group)
        out = {
            "qweight": qweight,
            "scales": scales,
            "szeros": szeros,
        }
        if self.in_perm is not None:
            out["in_perm"] = self.in_perm.astype(np.int32)
        return out


def infer_quant_method(params: Dict[str, Any]) -> "QuantLinearMethod":
    """Derive (bits, group_size) from packed param dtype/shape — static
    under jit, so this costs nothing at runtime. uint8 = 4-bit packed
    pairs; int8 = 8-bit stored as q-128 with the offset folded into
    szeros."""
    qw = params["qweight"]
    n_groups = params["scales"].shape[0]
    if qw.dtype == jnp.uint8.dtype:
        bits, k = 4, qw.shape[0] * 2
    else:
        bits, k = 8, qw.shape[0]
    return QuantLinearMethod(bits, k // n_groups)


class QuantLinearMethod(LinearMethod):
    """Fused dequant-matmul (Pallas) or dense-dequant fallback."""

    name = "quant"

    def __init__(self, bits: int, group_size: int) -> None:
        self.bits = bits
        self.group_size = group_size

    def partition_specs(self, mode: str) -> Dict[str, P]:
        if mode == "column":
            return {
                "qweight": P(None, "model"),
                "scales": P(None, "model"),
                "szeros": P(None, "model"),
                "in_perm": P(),
                "bias": P("model"),
            }
        if mode == "row":
            return {
                "qweight": P("model", None),
                "scales": P("model", None),
                "szeros": P("model", None),
                "in_perm": P(),  # permutation indexes the sharded axis;
                # act-order + TP row-parallel requires perm-aware
                # sharding — rejected at load (gptq.py).
                "bias": P(),
            }
        return {k: P() for k in
                ("qweight", "scales", "szeros", "in_perm", "bias")}

    def apply(self, params: Dict[str, jax.Array],
              x: jax.Array) -> jax.Array:
        if "in_perm" in params:
            x = x[:, params["in_perm"]]
        k_packed = (params["qweight"].shape[0] *
                    (2 if self.bits == 4 else 1))
        if x.shape[1] < k_packed:
            # K was padded at load for exact kernel K-tiling
            # (as_params); zero x columns keep the padded rows inert.
            x = jnp.pad(x, ((0, 0), (0, k_packed - x.shape[1])))
        group_size = self.group_size
        if group_size == -1:
            # per-channel: one group spanning local K
            group_size = k_packed
        if envs.VLT_USE_XLA_OPS:
            from vllm_legacy_tpu.ops.pallas.quant_matmul import (
                dequantize_reference)
            w = dequantize_reference(params["qweight"], params["scales"],
                                     params["szeros"], bits=self.bits,
                                     group_size=group_size)
            out = jnp.dot(x.astype(jnp.float32), w,
                          preferred_element_type=jnp.float32)
        else:
            from vllm_legacy_tpu.ops.pallas.quant_matmul import quant_matmul
            out = quant_matmul(x, params["qweight"], params["scales"],
                               params["szeros"], bits=self.bits,
                               group_size=group_size,
                               interpret=bool(envs.VLT_PALLAS_INTERPRET))
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
