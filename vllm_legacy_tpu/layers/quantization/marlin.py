"""Marlin-serialized checkpoint support (dense + 2:4 sparse).

The reference keeps marlin checkpoints in their GPU tensor-core layout
and runs dedicated CUDA GEMMs (vllm/model_executor/layers/quantization/
marlin.py:16, gptq_marlin_24.py, csrc/quantization/marlin/). The TPU has
no tensor-core ldmatrix layout and no sparse MXU, so both formats are
DECODED AT LOAD TIME back to plain row-major int4/int8 values and then
repacked into the common TPU layout (common.py) consumed by the one
Pallas fused dequant-matmul; 2:4-pruned positions decode to the zero
point so they dequantize to exactly 0.0 in the dense MXU matmul.

Format facts (derived from the reference pack utilities:
utils/marlin_perms.py, utils/marlin_24_perms.py, utils/marlin_utils.py,
utils/format_24.py — we implement the INVERSE maps):

  dense "marlin":  B  int32 [K/16, N*16/8]  s  f16 [K/g | 1, N]
    q[K,N] -> 16x16 tile transpose -> per-1024 tensor-core permutation
    -> column-interleaved nibble pack. Symmetric: zero point = 8.

  sparse "gptq_marlin_24":  B_24 int32 [K/32, N*16/8]
                            B_meta int16 [K/32, N*2]   s f16 [K/g|1, N]
    q[K,N] minus zp, transposed, CUTLASS 2:4-compressed along K into
    values [N, K/2] + int16 metadata (4-bit quad codes, swizzled by the
    CUTLASS ColumnMajorInterleaved<2> reordering), values re-transposed,
    zp restored, then marlin-packed like the dense format but with the
    marlin_24 permutation and [32, 64] tiles.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_legacy_tpu.layers.quantization.common import (
    PackedQuantParams, QuantLinearMethod, pack_rows_to_bytes)

TILE = 16


# ---------------------------------------------------------------------
# The marlin permutations (format constants, reimplemented from their
# definitions in utils/marlin_perms.py:14 / marlin_24_perms.py:14).
# ---------------------------------------------------------------------
def _nibble_interleave(num_bits: int) -> np.ndarray:
    if num_bits == 4:
        return np.array([0, 2, 4, 6, 1, 3, 5, 7])
    if num_bits == 8:
        return np.array([0, 2, 1, 3])
    raise ValueError(f"marlin supports 4/8 bits, got {num_bits}")


def _weight_perm(num_bits: int, sparse24: bool) -> np.ndarray:
    """The 1024-entry tensor-core reorder applied to each row chunk of
    the 16x16-tiled weight matrix."""
    base = []
    for i in range(32):
        col = i // 4
        rows = [2 * (i % 4), 2 * (i % 4) + 1,
                2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1]
        if sparse24:
            cell = [16 * r + (col // 2) * 256 + 8 * (col % 2) + 4 * b
                    for b in (0, 1) for r in rows]
            stride = 1
        else:
            cell = [16 * r + col + 8 * b for b in (0, 1) for r in rows]
            stride = 256
        for j in range(4):
            base.extend(p + stride * j for p in cell)
    perm = np.array(base)
    il = _nibble_interleave(num_bits)
    return perm.reshape(-1, il.size)[:, il].ravel()


def _scale_perms(sparse24: bool):
    """(grouped, per-channel) scale column permutations."""
    if sparse24:
        grouped = [i * 8 + j for i in range(8)
                   for j in (0, 4, 1, 5, 2, 6, 3, 7)]
        single = list(range(64))
    else:
        grouped = [i + 8 * j for i in range(8) for j in range(8)]
        single = [2 * i + j for i in range(4)
                  for j in (0, 1, 8, 9, 16, 17, 24, 25)]
    return np.array(grouped), np.array(single)


# ---------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------
def _unpack_cols(packed: np.ndarray, num_bits: int) -> np.ndarray:
    """Invert the column-interleaved pack: int32 [R, C/pf] -> values
    [R, C] where source column i::pf sits at bits num_bits*i."""
    pf = 32 // num_bits
    mask = (1 << num_bits) - 1
    p = packed.astype(np.uint32)
    out = np.empty((packed.shape[0], packed.shape[1] * pf), np.uint8)
    for i in range(pf):
        out[:, i::pf] = (p >> (num_bits * i)) & mask
    return out


def _decode_marlin_weights(b: np.ndarray, size_k: int, size_n: int,
                           num_bits: int, sparse24: bool) -> np.ndarray:
    """marlin-packed int32 -> plain q values [size_k, size_n]."""
    assert b.shape == (size_k // TILE, size_n * TILE * num_bits // 32), (
        b.shape, size_k, size_n)
    q = _unpack_cols(b, num_bits)
    perm = _weight_perm(num_bits, sparse24)
    inv = np.argsort(perm)
    q = q.reshape(-1, perm.size)[:, inv].reshape(size_k // TILE,
                                                 size_n * TILE)
    q = q.reshape(size_k // TILE, size_n // TILE, TILE, TILE)
    return q.transpose(0, 2, 1, 3).reshape(size_k, size_n)


def _decode_marlin_scales(s: np.ndarray, size_n: int, group_size: int,
                          size_k: int, sparse24: bool) -> np.ndarray:
    grouped, single = _scale_perms(sparse24)
    perm = grouped if 0 < group_size < size_k else single
    inv = np.argsort(perm)
    s = s.reshape(-1, perm.size)[:, inv]
    return s.reshape(-1, size_n).astype(np.float32)


def _meta_swizzle_offsets(m: int, meta_ncols: int) -> np.ndarray:
    """CUTLASS ColumnMajorInterleaved<2> metadata placement for int16
    meta elements (format_24.py:21): flat destination offset of each
    (row, col) of the logical meta matrix."""
    rows = np.arange(m)[:, None] * np.ones((1, meta_ncols), np.int64)
    cols = np.ones((m, 1), np.int64) * np.arange(meta_ncols)[None, :]
    group_x, group_y = 64, 32  # int16 meta
    rows = (rows // group_x * group_x + (rows % 2) * 2 +
            (rows % 8) // 4 + ((rows % group_y) % 4) // 2 * 32 +
            ((rows % group_x) // 8) * 4)
    # swap the 2x2 sub-block corners
    tr = ((rows % 2 == 0) & (cols % 2 == 1)).astype(np.int64)
    bl = ((rows % 2 == 1) & (cols % 2 == 0)).astype(np.int64)
    rows = rows + tr - bl
    cols = cols - tr + bl
    return (cols // 2 * m * 2 + rows * 2 + cols % 2).ravel()


def _decompress_24(values_t: np.ndarray, meta_flat: np.ndarray,
                   size_k: int, size_n: int) -> np.ndarray:
    """Invert the CUTLASS 2:4 compression.

    values_t: signed kept values, transposed [size_n, size_k//2]
    meta_flat: the swizzled int16 metadata buffer, flattened
    returns: signed dense [size_n, size_k]; pruned slots are 0.
    """
    m, meta_ncols = size_n, size_k // 16  # 4 quads per int16 element
    offsets = _meta_swizzle_offsets(m, meta_ncols)
    meta = np.empty(m * meta_ncols, np.uint16)
    meta[:] = meta_flat.astype(np.uint16)[offsets]
    meta = meta.reshape(m, meta_ncols)

    # expand 4-bit quad codes: low 2 bits = position of kept value 0,
    # high 2 bits = position of kept value 1 (within the 4-wide quad)
    quads = np.stack([(meta >> (4 * q)) & 0xF for q in range(4)],
                     axis=-1).reshape(m, size_k // 4)
    idx0 = (quads & 0x3).astype(np.int64)
    idx1 = ((quads >> 2) & 0x3).astype(np.int64)

    dense = np.zeros((m, size_k // 4, 4), values_t.dtype)
    v = values_t.reshape(m, size_k // 4, 2)
    np.put_along_axis(dense, idx0[:, :, None], v[:, :, :1], axis=2)
    np.put_along_axis(dense, idx1[:, :, None], v[:, :, 1:], axis=2)
    return dense.reshape(m, size_k)


# ---------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------
class MarlinConfig(QuantizationConfig):
    """Dense marlin-serialized checkpoints (B/s tensor names)."""

    def __init__(self, group_size: int, weight_bits: int = 4) -> None:
        self.weight_bits = weight_bits
        self.group_size = group_size

    @classmethod
    def get_name(cls) -> str:
        return "marlin"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "MarlinConfig":
        return cls(group_size=cls.get_from_keys(config, ["group_size"]),
                   weight_bits=int(config.get("bits", 4)))

    def get_linear_method(self) -> QuantLinearMethod:
        return QuantLinearMethod(self.weight_bits, self.group_size)

    def wants(self, tensors: Dict[str, Any]) -> bool:
        return "B" in tensors and "B_meta" not in tensors

    def convert_layer(self,
                      tensors: Dict[str, np.ndarray]) -> PackedQuantParams:
        b = np.asarray(tensors["B"])
        s = np.asarray(tensors["s"])
        bits = self.weight_bits
        size_n = s.shape[-1]
        size_k = b.shape[0] * TILE
        q = _decode_marlin_weights(b, size_k, size_n, bits, sparse24=False)
        scales = _decode_marlin_scales(s, size_n, self.group_size, size_k,
                                       sparse24=False)
        group = self.group_size if 0 < self.group_size < size_k else size_k
        zp = float(1 << (bits - 1))  # symmetric quant: zero at mid-range
        szeros = scales * zp
        if bits == 4:
            packed = pack_rows_to_bytes(q)
        else:
            packed = (q.astype(np.int16) - 128).astype(np.int8)
            szeros = scales * (zp - 128.0)
        return PackedQuantParams(packed, scales, szeros, bits, group)


class GPTQMarlin24Config(QuantizationConfig):
    """2:4 sparse marlin checkpoints (B_24/B_meta/s tensor names)."""

    def __init__(self, weight_bits: int, group_size: int) -> None:
        if weight_bits not in (4, 8):
            raise ValueError(f"marlin_24 supports 4/8 bits, "
                             f"got {weight_bits}")
        self.weight_bits = weight_bits
        self.group_size = group_size

    @classmethod
    def get_name(cls) -> str:
        return "gptq_marlin_24"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQMarlin24Config":
        return cls(weight_bits=cls.get_from_keys(config, ["bits"]),
                   group_size=cls.get_from_keys(config, ["group_size"]))

    def get_linear_method(self) -> QuantLinearMethod:
        return QuantLinearMethod(self.weight_bits, self.group_size)

    def wants(self, tensors: Dict[str, Any]) -> bool:
        return "B_24" in tensors

    def convert_layer(self,
                      tensors: Dict[str, np.ndarray]) -> PackedQuantParams:
        b24 = np.asarray(tensors["B_24"])
        meta = np.asarray(tensors["B_meta"])
        s = np.asarray(tensors["s"])
        bits = self.weight_bits
        zp = 1 << (bits - 1)
        size_n = s.shape[-1]
        size_k = b24.shape[0] * TILE * 2  # packed matrix holds K/2 rows

        # 1. un-marlin the compressed values [K/2, N]
        q_comp = _decode_marlin_weights(b24, size_k // 2, size_n, bits,
                                        sparse24=True)
        # 2. undo the 2:4 compression (signed domain, transposed)
        signed_t = q_comp.astype(np.int32).T - zp
        dense_t = _decompress_24(signed_t, meta.ravel(), size_k, size_n)
        q = (dense_t.T + zp).astype(np.uint8)  # pruned slots == zp

        scales = _decode_marlin_scales(s, size_n, self.group_size, size_k,
                                       sparse24=True)
        group = self.group_size if 0 < self.group_size < size_k else size_k
        szeros = scales * float(zp)
        if bits == 4:
            packed = pack_rows_to_bytes(q)
        else:
            packed = (q.astype(np.int16) - 128).astype(np.int8)
            szeros = scales * float(zp - 128)
        return PackedQuantParams(packed, scales, szeros, bits, group)
