"""Pinned greedy-generation / logprob snapshots per quant method
(reference pattern: tests/models/test_fp8.py pins generations for each
quantization so numeric drift fails loudly).

Each scheme from the quantized-llama harness runs a fixed forward on
the CPU backend (exact f32); the greedy next-token ids and top-5
logprobs at the final position are compared against
``tests/snapshots/quant_pinned.json``. If the snapshot file is missing
the test writes it (commit the result); any later change to loaders,
packed layouts, or the dequant kernels that shifts numerics fails
here.
"""
import json
import os

import numpy as np
import pytest

SNAP_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "snapshots", "quant_pinned.json")


def _compute(scheme):
    # reuse the quantized-llama harness end to end
    from tests.models import test_quantized_llama as harness
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  padded_head_size)
    from vllm_legacy_tpu.models.llama import LlamaForCausalLM
    from vllm_legacy_tpu.parallel.mesh import build_mesh
    from vllm_legacy_tpu.testing_utils import tiny_llama_hf_config

    (h, inter, nh), quant_cfg, packer = harness.SCHEMES[scheme]
    d = h // nh
    vocab = 256
    hf = tiny_llama_hf_config(vocab_size=vocab, hidden_size=h,
                              intermediate_size=inter,
                              num_hidden_layers=2,
                              num_attention_heads=nh,
                              num_key_value_heads=nh)
    rng = np.random.RandomState(0)
    quant = LlamaForCausalLM(hf, dtype=jnp.float32,
                             quant_config=quant_cfg)

    def t(shape, scale=0.05):
        return (rng.randn(*shape) * scale).astype(np.float32)

    ckpt = [("model.embed_tokens.weight", t((vocab, h))),
            ("model.norm.weight", np.ones((h, ), np.float32)),
            ("lm_head.weight", t((vocab, h)))]
    for i in range(2):
        p = f"model.layers.{i}."
        ckpt.append((p + "input_layernorm.weight",
                     np.ones((h, ), np.float32)))
        ckpt.append((p + "post_attention_layernorm.weight",
                     np.ones((h, ), np.float32)))
        for proj, shape in (
            ("self_attn.q_proj", (nh * d, h)),
            ("self_attn.k_proj", (nh * d, h)),
            ("self_attn.v_proj", (nh * d, h)),
            ("self_attn.o_proj", (h, nh * d)),
            ("mlp.gate_proj", (inter, h)),
            ("mlp.up_proj", (inter, h)),
            ("mlp.down_proj", (h, inter)),
        ):
            ckpt.append((p + proj + ".weight", t(shape)))

    qckpt = []
    for name, w in ckpt:
        if ("self_attn" in name or "mlp" in name) and name.endswith(
                ".weight"):
            tensors, _ = packer(w.T.astype(np.float32), rng)
            base = name[:-len(".weight")]
            for k, v in tensors.items():
                qckpt.append((base + "." + k, v))
        else:
            qckpt.append((name, w))
    params = quant.load_weights(iter(qckpt))

    mesh = build_mesh(1, 1)
    b, l = 2, 16
    tok_rng = np.random.RandomState(7)
    tokens = jnp.asarray(tok_rng.randint(0, vocab - 1, (b, l)),
                         jnp.int32)
    positions = jnp.tile(jnp.arange(l, dtype=jnp.int32)[None], (b, 1))
    d_pad = padded_head_size(d)
    kv = (jnp.zeros((2, 8, nh, 16, d_pad), jnp.float32),
          jnp.zeros((2, 8, nh, 16, d_pad), jnp.float32))
    md = AttentionMetadata(
        slot_mapping=jnp.arange(b * l, dtype=jnp.int32),
        block_tables=jnp.tile(jnp.arange(4, dtype=jnp.int32)[None],
                              (b, 1)),
        context_lens=jnp.full((b, ), l, jnp.int32),
        query_lens=jnp.full((b, ), l, jnp.int32),
    )
    specs = quant.param_specs(params)
    cache_spec = P(None, None, "model", None, None)
    rep = P()

    def fwd(p, kvc, tok, pos, m):
        hidden, kvc = quant.forward(p, kvc, tok, pos, m)
        return quant.compute_logits(
            p, hidden.reshape(-1, hidden.shape[-1])), kvc

    fn = shard_map(fwd, mesh=mesh,
                   in_specs=(specs, (cache_spec, cache_spec), rep, rep,
                             AttentionMetadata(rep, rep, rep, rep)),
                   out_specs=(rep, (cache_spec, cache_spec)),
                   check_vma=False)
    dev = jax.tree.map(jnp.asarray, params)
    logits, _ = jax.jit(fn)(dev, kv, tokens, positions, md)
    logits = np.asarray(logits, np.float64).reshape(b, l, -1)
    last = logits[:, -1, :vocab]
    lp = last - np.log(np.exp(last - last.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - last.max(-1, keepdims=True)
    greedy = np.argmax(last, axis=-1)
    top5 = np.sort(lp, axis=-1)[:, -5:][:, ::-1]
    return {"greedy": greedy.tolist(),
            "top5_logprobs": np.round(top5, 4).tolist()}


def _schemes():
    from tests.models import test_quantized_llama as harness
    return sorted(harness.SCHEMES)


@pytest.mark.parametrize("scheme", _schemes())
def test_pinned_quant_snapshot(scheme):
    got = _compute(scheme)
    snaps = {}
    if os.path.exists(SNAP_PATH):
        with open(SNAP_PATH) as f:
            snaps = json.load(f)
    if scheme not in snaps:
        snaps[scheme] = got
        os.makedirs(os.path.dirname(SNAP_PATH), exist_ok=True)
        with open(SNAP_PATH, "w") as f:
            json.dump(snaps, f, indent=1, sort_keys=True)
        pytest.skip(f"snapshot for {scheme} written; commit it")
    want = snaps[scheme]
    assert got["greedy"] == want["greedy"], (
        f"{scheme}: greedy tokens drifted: {got['greedy']} vs "
        f"{want['greedy']}")
    np.testing.assert_allclose(
        np.asarray(got["top5_logprobs"]),
        np.asarray(want["top5_logprobs"]), atol=5e-3, rtol=0,
        err_msg=f"{scheme}: top-5 logprobs drifted")
