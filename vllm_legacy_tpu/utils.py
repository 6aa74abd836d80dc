"""Small shared utilities.

Capability parity with the reference's ``vllm/utils.py`` (Counter :45,
LRUCache :59, make_tensor_with_pad :505, get_open_port :289) — re-designed
for a single-controller JAX host process (no CUDA memory profilers needed:
TPU HBM budgeting is deterministic, see worker/cache_engine.py).
"""
from __future__ import annotations

import enum
import socket
import time
import uuid
from collections import OrderedDict
from typing import Any, Generic, Hashable, Optional, TypeVar

import numpy as np

T = TypeVar("T")


class Device(enum.Enum):
    TPU = enum.auto()
    CPU = enum.auto()


class Counter:
    """Monotonic integer id generator."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


class LRUCache(Generic[T]):
    """Ordered-dict LRU with an eviction hook."""

    def __init__(self, capacity: int):
        self.cache: OrderedDict[Hashable, T] = OrderedDict()
        self.capacity = capacity

    def __contains__(self, key: Hashable) -> bool:
        return key in self.cache

    def __len__(self) -> int:
        return len(self.cache)

    def get(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        return default

    def put(self, key: Hashable, value: T) -> None:
        self.cache[key] = value
        self.cache.move_to_end(key)
        while len(self.cache) > self.capacity:
            k, v = self.cache.popitem(last=False)
            self._on_remove(k, v)

    def remove(self, key: Hashable) -> None:
        if key in self.cache:
            v = self.cache.pop(key)
            self._on_remove(key, v)

    def clear(self) -> None:
        while self.cache:
            k, v = self.cache.popitem(last=False)
            self._on_remove(k, v)

    def _on_remove(self, key: Hashable, value: T) -> None:
        pass


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def make_ndarray_with_pad(
    x: list[list[int]],
    pad: int,
    dtype: Any,
    *,
    max_len: Optional[int] = None,
) -> np.ndarray:
    """Pad a ragged list-of-lists into a dense [len(x), max_len] ndarray.

    Host-side analogue of the reference's make_tensor_with_pad
    (vllm/utils.py:505) — numpy, because batch assembly stays on host and
    is shipped to the device once per step.
    """
    if max_len is None:
        max_len = max((len(row) for row in x), default=0)
    out = np.full((len(x), max_len), pad, dtype=dtype)
    for i, row in enumerate(x):
        if row:
            out[i, : len(row)] = row
    return out


def in_wsl() -> bool:
    return False


async def merge_async_iterators(*iterators):
    """Multiplex async iterators into (index, item) pairs (reference:
    vllm/utils.py merge_async_iterators)."""
    import asyncio

    queue: "asyncio.Queue" = asyncio.Queue()
    finished = [False] * len(iterators)

    async def producer(i, iterator):
        try:
            async for item in iterator:
                await queue.put((i, item))
        except Exception as e:
            await queue.put(e)
        finished[i] = True

    tasks = [
        asyncio.create_task(producer(i, it))
        for i, it in enumerate(iterators)
    ]
    try:
        while not all(finished) or not queue.empty():
            item = await queue.get()
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        for task in tasks:
            task.cancel()


class MonotonicTimer:
    def __init__(self) -> None:
        self.start = time.monotonic()

    def elapsed(self) -> float:
        return time.monotonic() - self.start


STR_DTYPE_TO_JAX_DTYPE = {
    "half": "float16",
    "float16": "float16",
    "bfloat16": "bfloat16",
    "float": "float32",
    "float32": "float32",
    "fp8": "float8_e4m3fn",
    "fp8_e4m3": "float8_e4m3fn",
    "fp8_e5m2": "float8_e5m2",
    "int8": "int8",
    "auto": "bfloat16",
}
