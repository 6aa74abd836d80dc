"""Pure-JAX token sampler, jitted with the model step.

Capability parity with the reference's torch sampler
(vllm/model_executor/layers/sampler.py :21 — penalties :200, temperature,
top-k/p :223, min-p :255, greedy/random/seeded dispatch :452-556, logprob
gathering :689) redesigned as one vectorized pass: every row carries its
own knobs, greedy rows are argmax-selected by mask, and seeded rows fold
their seed into the step key — no per-group Python loop on the hot path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SAMPLING_EPS = 1e-5


@jax.tree_util.register_dataclass
@dataclass
class SamplingTensors:
    """Per-row sampling parameters, shipped to device once per step
    (reference: model_executor/sampling_metadata.py SamplingTensors
    :290). Registered as a pytree so it can cross jit boundaries."""
    temperature: jax.Array  # [B] f32
    top_p: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32 (0 = disabled)
    min_p: jax.Array  # [B] f32
    presence_penalty: jax.Array  # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    repetition_penalty: jax.Array  # [B] f32
    is_greedy: jax.Array  # [B] bool
    seeds: jax.Array  # [B] u32 (0 = unseeded)
    seed_positions: jax.Array  # [B] i32 — #generated tokens, for seeded rows
    # Token history for penalties; only populated when do_penalties.
    prompt_tokens: jax.Array  # [B, Lp] i32, padded with -1
    output_tokens: jax.Array  # [B, Lo] i32, padded with -1

    @classmethod
    def from_lists(
        cls,
        temperature: List[float],
        top_p: List[float],
        top_k: List[int],
        min_p: List[float],
        presence: List[float],
        frequency: List[float],
        repetition: List[float],
        is_greedy: List[bool],
        seeds: List[int],
        seed_positions: Optional[List[int]] = None,
        prompt_tokens: Optional[List[List[int]]] = None,
        output_tokens: Optional[List[List[int]]] = None,
        pad_to: Optional[int] = None,
    ) -> "SamplingTensors":
        return cls(**jax.tree.map(
            jnp.asarray,
            cls.np_fields(temperature, top_p, top_k, min_p, presence,
                          frequency, repetition, is_greedy, seeds,
                          seed_positions, prompt_tokens, output_tokens,
                          pad_to)))

    @classmethod
    def np_fields(
        cls,
        temperature: List[float],
        top_p: List[float],
        top_k: List[int],
        min_p: List[float],
        presence: List[float],
        frequency: List[float],
        repetition: List[float],
        is_greedy: List[bool],
        seeds: List[int],
        seed_positions: Optional[List[int]] = None,
        prompt_tokens: Optional[List[List[int]]] = None,
        output_tokens: Optional[List[List[int]]] = None,
        pad_to: Optional[int] = None,
    ) -> dict:
        """Field dict as host numpy, so the runner can pack every step
        input into one host->device transfer (tunnel RTT dominates the
        step otherwise)."""
        from vllm_legacy_tpu.utils import make_ndarray_with_pad
        n = len(temperature)
        pad = pad_to if pad_to is not None else n

        def fill(x, fill_value, dtype):
            a = np.full((pad, ), fill_value, dtype)
            a[:n] = np.asarray(x, dtype)
            return a

        def tok(lists):
            if not lists:
                return np.full((pad, 1), -1, np.int32)
            arr = make_ndarray_with_pad(lists, -1, np.int32)
            if arr.shape[0] < pad:
                arr = np.pad(arr, ((0, pad - arr.shape[0]), (0, 0)),
                             constant_values=-1)
            if arr.shape[1] == 0:
                arr = np.full((pad, 1), -1, np.int32)
            return arr

        return dict(
            temperature=fill(temperature, 1.0, np.float32),
            top_p=fill(top_p, 1.0, np.float32),
            top_k=fill(top_k, 0, np.int32),
            min_p=fill(min_p, 0.0, np.float32),
            presence_penalty=fill(presence, 0.0, np.float32),
            frequency_penalty=fill(frequency, 0.0, np.float32),
            repetition_penalty=fill(repetition, 1.0, np.float32),
            is_greedy=fill(is_greedy, True, np.bool_),
            seeds=fill(seeds, 0, np.uint32),
            seed_positions=fill(seed_positions or [0] * n, 0, np.int32),
            prompt_tokens=tok(prompt_tokens or []),
            output_tokens=tok(output_tokens or []),
        )


def _token_counts(tokens: jax.Array, vocab_size: int) -> jax.Array:
    """[B, L] padded with -1 -> [B, V] occurrence counts (drop pads)."""
    b = tokens.shape[0]
    counts = jnp.zeros((b, vocab_size), jnp.int32)
    clamped = jnp.where(tokens < 0, vocab_size, tokens)
    return counts.at[jnp.arange(b)[:, None], clamped].add(1, mode="drop")


def apply_penalties(logits: jax.Array, st: SamplingTensors) -> jax.Array:
    """Presence/frequency/repetition penalties (reference: sampler.py
    :200, _apply_penalties)."""
    vocab = logits.shape[-1]
    out_counts = _token_counts(st.output_tokens, vocab)
    prompt_counts = _token_counts(st.prompt_tokens, vocab)
    seen = ((out_counts + prompt_counts) > 0)
    rep = st.repetition_penalty[:, None]
    logits = jnp.where(
        seen, jnp.where(logits > 0, logits / rep, logits * rep), logits)
    logits = logits - st.frequency_penalty[:, None] * out_counts
    logits = logits - st.presence_penalty[:, None] * (out_counts > 0)
    return logits


def _apply_top_k_top_p(logits: jax.Array, top_k: jax.Array,
                       top_p: jax.Array) -> jax.Array:
    """Mask logits outside per-row top-k / nucleus top-p (reference:
    sampler.py _apply_top_k_top_p :223 — same sort-based formulation)."""
    vocab = logits.shape[-1]
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    rank = jnp.arange(vocab)[None, :]

    k = jnp.where(top_k <= 0, vocab, top_k)[:, None]
    k_mask = rank < k

    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p; always keep
    # the first token.
    p_mask = (cum - probs) < top_p[:, None]
    p_mask = p_mask.at[:, 0].set(True)

    keep_sorted = k_mask & p_mask
    masked_sorted = jnp.where(keep_sorted, sorted_logits, -jnp.inf)
    # unsort
    inv = jnp.argsort(sorted_idx, axis=-1)
    return jnp.take_along_axis(masked_sorted, inv, axis=-1)


def _apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= (min_p[:, None] * top)
    return jnp.where(keep, logits, -jnp.inf)


def sample(
    logits: jax.Array,  # [B, V] f32
    st: SamplingTensors,
    step_key: jax.Array,  # base PRNG key for this step
    *,
    do_penalties: bool = False,
    do_top_k_p: bool = False,
    do_min_p: bool = False,
    all_greedy: bool = False,
    max_logprobs: int = 0,
    token_mask: Optional[jax.Array] = None,  # [B, V] bool, True = allowed
    n_samples: int = 1,  # best_of > 1 prompt phase: samples per row
):
    """Returns (sampled_ids [B], logprob of sampled [B],
    (top_logprob_vals, top_logprob_ids) [B, max_logprobs] or None).

    The boolean flags are STATIC jit specializations: the full-vocab
    sort behind top-k/p costs tens of ms on TPU, so the all-greedy /
    plain-temperature fast paths must never trace it (the reference's
    analogous skip: sampler.py _apply_top_k_top_p gating).

    ``token_mask`` carries guided-decoding FSM masks and min-tokens
    EOS/stop-token suppression (reference: sampler.py
    _apply_min_tokens_penalty :153 and the guided logits processors) —
    applied before everything else so logprobs reflect the constrained
    distribution."""
    if token_mask is not None:
        logits = jnp.where(token_mask, logits, -jnp.inf)
    if do_penalties:
        logits = apply_penalties(logits, st)

    raw_logprobs = jax.nn.log_softmax(logits, axis=-1)
    greedy_ids = jnp.argmax(logits, axis=-1)

    if all_greedy:
        sampled = greedy_ids
    else:
        temp = jnp.where(st.temperature < _SAMPLING_EPS, 1.0,
                         st.temperature)
        scaled = logits / temp[:, None]
        if do_top_k_p:
            scaled = _apply_top_k_top_p(scaled, st.top_k, st.top_p)
        if do_min_p:
            scaled = _apply_min_p(scaled, st.min_p)

        # Per-row keys derived from the step key by folding the row
        # index in; seeded rows instead fold their seed into a fixed
        # root so generation is reproducible per request regardless of
        # batch composition (reference: sampling_metadata.py :561).
        b = logits.shape[0]
        row_ids = jnp.arange(b, dtype=jnp.uint32)
        unseeded = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(
            row_ids)
        fixed_root = jax.random.PRNGKey(0)
        seeded = jax.vmap(lambda s, p: jax.random.fold_in(
            jax.random.fold_in(fixed_root, s), p))(st.seeds,
                                                   st.seed_positions)
        keys = jnp.where((st.seeds != 0)[:, None],
                         jax.vmap(jax.random.key_data)(seeded),
                         jax.vmap(jax.random.key_data)(unseeded))

        def sample_row(key_data, row_logits):
            return jax.random.categorical(
                jax.random.wrap_key_data(key_data), row_logits)

        random_ids = jax.vmap(sample_row)(keys, scaled)
        sampled = jnp.where(st.is_greedy, greedy_ids, random_ids)
        if n_samples > 1:
            # best_of independent draws per row (reference: sampler.py
            # _random_sample prompt phase drawing best_of samples)
            def sample_row_multi(key_data, row_logits):
                ks = jax.random.split(
                    jax.random.wrap_key_data(key_data), n_samples)
                return jax.vmap(
                    lambda kk: jax.random.categorical(kk,
                                                      row_logits))(ks)

            multi = jax.vmap(sample_row_multi)(keys, scaled)  # [B, S]
            multi = jnp.where(st.is_greedy[:, None],
                              greedy_ids[:, None], multi)
            multi = multi.at[:, 0].set(sampled)

    sampled_logprob = jnp.take_along_axis(raw_logprobs, sampled[:, None],
                                          axis=-1)[:, 0]
    top = None
    if max_logprobs > 0:
        vals, ids = jax.lax.top_k(raw_logprobs, max_logprobs)
        top = (vals, ids)
    if n_samples > 1 and not all_greedy:
        multi_lp = jnp.take_along_axis(raw_logprobs, multi, axis=-1)
        return sampled, sampled_logprob, top, (multi, multi_lp)
    return sampled, sampled_logprob, top, None
