"""ctypes bindings for the native host library (csrc/vlt_host.cpp).

Builds the shared library on first import when missing or stale (g++ is
part of the toolchain; pybind11 is not in the image, hence the C ABI).
Every entry point has a pure-Python fallback producing IDENTICAL values
so behavior does not depend on the toolchain — set VLT_DISABLE_NATIVE=1
to force the fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_MASK = (1 << 64) - 1
_CHAIN_SALT = 0x9e3779b97f4a7c15

_lib = None


def _csrc_dir() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "csrc")


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.getenv("VLT_DISABLE_NATIVE"):
        return None
    src = os.path.join(_csrc_dir(), "vlt_host.cpp")
    if not os.path.isfile(src):
        return None
    build_dir = os.path.join(_csrc_dir(), "build")
    lib_path = os.path.join(build_dir, "libvlt_host.so")
    try:
        if (not os.path.isfile(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", lib_path],
                check=True, capture_output=True)
            logger.info("Built native host library: %s", lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.vlt_hash_seed.restype = ctypes.c_uint64
        lib.vlt_hash_seed.argtypes = [ctypes.c_int64]
        lib.vlt_hash_block_chain.restype = ctypes.c_uint64
        lib.vlt_hash_block_chain.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64
        ]
        lib.vlt_ngram_propose.restype = ctypes.c_int64
        lib.vlt_ngram_propose.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:
        logger.warning("Native host library unavailable (%s); "
                       "using Python fallbacks", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


# -- block-hash chain ----------------------------------------------------
def _fnv_step(h: int, v: int) -> int:
    for i in range(8):
        h ^= (v >> (i * 8)) & 0xFF
        h = (h * _FNV_PRIME) & _MASK
    return h


def hash_seed(lora_id: int) -> int:
    lib = _load()
    if lib is not None:
        return int(lib.vlt_hash_seed(lora_id))
    return _fnv_step(_FNV_OFFSET, lora_id & _MASK)


def hash_block_chain(prev: int, tokens: List[int]) -> int:
    lib = _load()
    if lib is not None:
        arr = np.asarray(tokens, dtype=np.int32)
        return int(
            lib.vlt_hash_block_chain(
                ctypes.c_uint64(prev),
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr)))
    h = _fnv_step(prev, _CHAIN_SALT)
    for t in tokens:
        h = _fnv_step(h, int(t) & 0xFFFFFFFF)
    return h


# -- n-gram prompt lookup --------------------------------------------------
def ngram_propose(token_ids: List[int], nmin: int, nmax: int,
                  k: int) -> Optional[List[int]]:
    lib = _load()
    arr = np.asarray(token_ids, dtype=np.int32)
    if lib is not None:
        out = np.empty((k, ), dtype=np.int32)
        count = lib.vlt_ngram_propose(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr), nmin, nmax, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if count <= 0:
            return None
        return [int(t) for t in out[:count]]
    # Python fallback mirrors csrc/vlt_host.cpp vlt_ngram_propose
    n = len(arr)
    nmin = max(nmin, 1)
    if n < nmin + 1:
        return None
    toks = arr.tolist()
    for length in range(min(nmax, n - 1), nmin - 1, -1):
        pattern = toks[n - length:]
        for start in range(n - 1 - length, -1, -1):
            if toks[start:start + length] == pattern:
                copy_from = start + length
                proposal = toks[copy_from:copy_from + k]
                if not proposal:
                    break
                return proposal
    return None
