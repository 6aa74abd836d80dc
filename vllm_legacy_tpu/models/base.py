"""Shared model scaffolding for the non-Llama families.

The reference's models each re-implement forward/load_weights/sample
(model_executor/models/*.py); here the common mechanics — vocab padding,
logits computation, generic dummy init from ``param_shapes()``, ALiBi
slopes — live in one mixin so each family file only describes its
architecture delta.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.layers import embedding


_NOISE_POOL_SIZE = 1048573  # prime: tiling never aligns with row strides

# When True (see lazy_dummy_init), make_noise_fn returns NoiseLeaf
# placeholders instead of materializing host arrays; the model runner
# expands them directly on device (one jit call, no 2GB+ of host page
# faults / transfer — dummy init of a 1.1B model took ~2 min on host).
_LAZY_DUMMY = False


class NoiseLeaf:
    """Deferred dummy-weight tensor: tile `pool` starting at `start`.

    Expanding on device must produce bit-identical values to the host
    path (same pool, same offsets), so eager and lazy init agree."""
    __slots__ = ("pool", "start", "shape", "np_dtype")

    def __init__(self, pool, start, shape, np_dtype):
        self.pool = pool
        self.start = start
        self.shape = tuple(int(s) for s in shape)
        self.np_dtype = np_dtype

    def materialize(self) -> np.ndarray:
        n = int(np.prod(self.shape))
        native = self.pool.view(
            np.uint16 if self.pool.dtype.itemsize == 2 else np.uint32)
        reps = (self.start + n) // self.pool.size + 1
        buf = np.empty((reps, self.pool.size), native.dtype)
        buf[:] = native[None, :]
        return buf.reshape(-1)[self.start:self.start + n] \
            .view(self.np_dtype).reshape(self.shape)


from contextlib import contextmanager


@contextmanager
def lazy_dummy_init():
    global _LAZY_DUMMY
    prev = _LAZY_DUMMY
    _LAZY_DUMMY = True
    try:
        yield
    finally:
        _LAZY_DUMMY = prev


def make_noise_fn(rng: np.random.RandomState, scale: float, np_dtype):
    """Seeded dummy-weight noise at memcpy speed: one pooled draw of
    ~1M normal samples, tiled (with a per-tensor prime offset) to each
    tensor's size. Statistically crude but cheap and deterministic —
    exactly what dummy-weight bring-up needs."""
    pool = (rng.standard_normal(_NOISE_POOL_SIZE) * scale).astype(np_dtype)
    state = {"off": 0}

    def noise(shape):
        n = int(np.prod(shape))
        start = state["off"] % pool.size
        state["off"] += 999983  # prime stride decorrelates tensors
        leaf = NoiseLeaf(pool, start, shape, np_dtype)
        return leaf if _LAZY_DUMMY else leaf.materialize()

    return noise


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Standard ALiBi slopes (reference: models/bloom.py _get_alibi_slopes
    / mpt.py — geometric 2^(-8i/n) with the non-power-of-2 extension)."""
    closest = 2**math.floor(math.log2(num_heads))
    base = 2.0**(-(2.0**-(math.log2(closest) - 3)))
    powers = np.arange(1, closest + 1, dtype=np.float64)
    slopes = base**powers
    if closest != num_heads:
        extra_base = 2.0**(-(2.0**-(math.log2(2 * closest) - 3)))
        num_rem = min(closest, num_heads - closest)
        extra = extra_base**np.arange(1, 2 * num_rem + 1, 2,
                                      dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


class ModelBase:
    """Mixin: vocab-padded logits + generic dummy init.

    Subclasses must set: vocab_size, org_vocab_size, tp_size, dtype and
    implement param_shapes() (pytree of (shape, dtype)); constants that
    are computed rather than loaded (rope caches, alibi slopes) come
    from :meth:`constant_params` and are merged over the random init.
    """
    logit_scale: float = 1.0
    logit_soft_cap: Optional[float] = None
    lm_head_key: str = "lm_head"

    def compute_logits(self, params, hidden):
        logits = embedding.compute_logits(
            params[self.lm_head_key], hidden,
            logit_scale=self.logit_scale,
            soft_cap=self.logit_soft_cap, tp_size=self.tp_size)
        if self.vocab_size != self.org_vocab_size:
            mask = jnp.arange(self.vocab_size) >= self.org_vocab_size
            logits = jnp.where(mask[None, :],
                               jnp.finfo(jnp.float32).min, logits)
        return logits

    def constant_params(self) -> Dict[str, Any]:
        return {}

    def _pad_vocab(self, w: np.ndarray) -> np.ndarray:
        if w.shape[0] < self.vocab_size:
            w = np.pad(w, ((0, self.vocab_size - w.shape[0]), (0, 0)))
        return w

    def _np_dtype(self):
        import ml_dtypes
        return (ml_dtypes.bfloat16
                if self.dtype == jnp.bfloat16 else np.float32)

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random weights shaped by param_shapes() (reference:
        DummyModelLoader, model_loader/loader.py:261). Norm weights init
        to one, biases to zero, everything else tiled N(0, 0.02) noise
        (see make_noise_fn — generating billions of fresh normal
        samples took minutes of host time)."""
        rng = np.random.RandomState(seed)
        np_dtype = self._np_dtype()
        constants = self.constant_params()
        noise = make_noise_fn(rng, 0.02, np_dtype)

        def make(tree, path=""):
            if isinstance(tree, dict):
                return {k: make(v, f"{path}.{k}") for k, v in tree.items()}
            if isinstance(tree, list):
                return [make(v, path) for v in tree]
            shape, _ = tree
            leaf = path.rsplit(".", 1)[-1]
            parent = path.rsplit(".", 2)[-2] if path.count(".") > 1 else ""
            is_norm = any(t in parent for t in ("norm", "ln_", "ln"))
            if leaf == "bias" or (is_norm and leaf == "weight"
                                  and len(shape) == 1):
                fill = 0.0 if leaf == "bias" else 1.0
                return np.full(shape, fill, np_dtype)
            return noise(shape)

        shapes = self.param_shapes()
        for k in constants:
            shapes.pop(k, None)
        params = make(shapes)
        params.update(constants)
        return params
