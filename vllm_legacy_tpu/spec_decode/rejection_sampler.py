"""Speculative-decoding verification (reference: vllm/model_executor/
layers/rejection_sampler.py :9 — modified rejection sampling :210).

Pure JAX, vectorized over the batch; two modes:

* greedy: accept proposal_i iff it equals the target argmax at that
  position; the first mismatching position emits the target argmax
  instead (exactly reproduces non-speculative greedy decoding);
* stochastic (one-hot draft, prompt-lookup): accept proposal_i with
  probability p_target(proposal_i); on rejection sample from the
  residual distribution with the proposal masked out.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def verify_greedy(
    target_logits: jax.Array,  # [B, K+1, V] f32
    proposals: jax.Array,  # [B, K] int32 (-1 = no proposal at slot)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [B, K+1] int32, num_emitted [B] int32).

    tokens[:, j] is valid for j < num_emitted; position j emits the
    target argmax given [ctx + accepted proposals < j].
    """
    b, k1, _ = target_logits.shape
    k = k1 - 1
    argmax = jnp.argmax(target_logits, axis=-1).astype(jnp.int32)
    if k == 0:
        return argmax, jnp.ones((b, ), jnp.int32)
    match = argmax[:, :k] == proposals  # [B, K]
    # prefix of matches: cumulative AND
    accepted = jnp.cumprod(match.astype(jnp.int32), axis=1)  # [B, K]
    num_accepted = jnp.sum(accepted, axis=1)  # [B]
    # emit accepted proposals (== argmax at those slots) plus one more
    # target token (the correction or the bonus).
    num_emitted = num_accepted + 1
    return argmax, num_emitted.astype(jnp.int32)


def verify_stochastic(
    target_logits: jax.Array,  # [B, K+1, V] f32
    proposals: jax.Array,  # [B, K] int32
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One-hot-draft rejection sampling (prompt-lookup proposals)."""
    b, k1, v = target_logits.shape
    k = k1 - 1
    probs = jax.nn.softmax(target_logits, axis=-1)  # [B, K+1, V]
    if k == 0:
        tok = jax.vmap(lambda kk, lg: jax.random.categorical(kk, lg))(
            jax.random.split(key, b), target_logits[:, 0])
        return tok[:, None].astype(jnp.int32), jnp.ones((b, ), jnp.int32)

    keys = jax.random.split(key, b * (k + 2)).reshape(b, k + 2, 2)
    prop_clamped = jnp.clip(proposals, 0, v - 1)
    p_prop = jnp.take_along_axis(
        probs[:, :k], prop_clamped[:, :, None], axis=-1)[..., 0]  # [B,K]
    u = jax.vmap(jax.vmap(
        lambda kd: jax.random.uniform(jax.random.wrap_key_data(kd))))(
            keys[:, :k])
    ok = (u < p_prop) & (proposals >= 0)
    accepted = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    num_accepted = jnp.sum(accepted, axis=1)

    # token at each slot: the proposal if accepted; at the first
    # rejected slot sample from residual (proposal masked out); the
    # bonus slot samples from the K-th distribution.
    def residual_sample(kd, logits_row, masked_token):
        masked = logits_row.at[masked_token].set(-jnp.inf)
        return jax.random.categorical(jax.random.wrap_key_data(kd),
                                      masked)

    resid = jax.vmap(jax.vmap(residual_sample))(
        keys[:, :k], target_logits[:, :k], prop_clamped)  # [B, K]
    bonus = jax.vmap(lambda kd, lg: jax.random.categorical(
        jax.random.wrap_key_data(kd), lg))(
            keys[:, k + 1], target_logits[:, k])  # [B]

    slots = jnp.arange(k)[None, :]
    tokens_k = jnp.where(slots < num_accepted[:, None], prop_clamped,
                         resid).astype(jnp.int32)
    tokens = jnp.concatenate([tokens_k, bonus[:, None].astype(jnp.int32)],
                             axis=1)  # [B, K+1]
    num_emitted = num_accepted + 1
    return tokens, num_emitted.astype(jnp.int32)
