"""InternLM-XComposer2: PLoRA decoder + out-of-band image encoder.

No transformers implementation exists (trust_remote_code checkpoint;
the reference tests it only against real checkpoints), so correctness
is internal equivalence:

- checkpoint-name mapping (``.linear`` wrapping, fused-wqkv Plora_B
  split) verified with sentinel fills,
- PLoRA math verified against a second model whose base weights have
  the adapter folded in (W + A@B) — with the image mask on every
  token, both must produce identical logits,
- no-image prompts must match a plain degrouped-Llama run of the same
  base weights end-to-end through the engine,
- image-encoder tiling layout: token count must equal
  (h*w+1)*(g/2)^2 + 1 + (h+1)*(g/2) (reference
  vllm/engine/image_encoder.py:252-254).
"""
import json
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

H, NQ, NKV, NL, V, INTER, R = 64, 4, 2, 2, 128, 96, 8
D = H // NQ
G = NQ // NKV

PROMPTS = ["Hello, my name is", "The quick brown fox"]
MAX_TOKENS = 10


def _cfg(**kw):
    base = dict(architectures=["InternLMXComposer2ForCausalLM"],
                vocab_size=V, hidden_size=H, num_hidden_layers=NL,
                num_attention_heads=NQ, num_key_value_heads=NKV,
                intermediate_size=INTER, max_position_embeddings=128,
                rms_norm_eps=1e-6, tie_word_embeddings=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


def t(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.02


def _grouped_qkv(wq, wk, wv):
    """Separate torch-layout q/k/v -> internlm2 grouped fused rows."""
    q = wq.reshape(NKV, G, D, H)
    k = wk.reshape(NKV, 1, D, H)
    v = wv.reshape(NKV, 1, D, H)
    return np.concatenate([q, k, v], axis=1).reshape(-1, H)


def _xc2_weights(rng, *, fold_plora=False, zero_plora=False):
    """Checkpoint tensor list in XComposer2 naming. With fold_plora the
    base weights absorb W + B@A and the ploras are zeroed — forward
    with im_mask everywhere must then match the unfolded model."""
    ws = [("model.tok_embeddings.weight", t(rng, V, H)),
          ("model.norm.weight", np.ones(H, np.float32)),
          ("output.weight", t(rng, V, H)),
          # encoder-side tensors the LM loader must skip
          ("vit.vision_tower.vision_model.junk", t(rng, 4)),
          ("vision_proj.0.weight", t(rng, 8, 8)),
          ("plora_glb_GN", t(rng, 1, 1, 8)),
          ("plora_sub_GN", t(rng, 1, 1, 1, 8))]
    for i in range(NL):
        p = f"model.layers.{i}"
        base = {
            "attention.wqkv": _grouped_qkv(t(rng, NQ * D, H),
                                           t(rng, NKV * D, H),
                                           t(rng, NKV * D, H)),
            "attention.wo": t(rng, H, NQ * D),
            "feed_forward.w1": t(rng, INTER, H),
            "feed_forward.w3": t(rng, INTER, H),
            "feed_forward.w2": t(rng, H, INTER),
        }
        ploras = {
            mod: (t(rng, R, w.shape[1]), t(rng, w.shape[0], R))
            for mod, w in base.items()
        }
        ws += [(f"{p}.attention_norm.weight", np.ones(H, np.float32)),
               (f"{p}.ffn_norm.weight", np.ones(H, np.float32))]
        for mod, w in base.items():
            a, b = ploras[mod]
            if fold_plora:
                w = w + b @ a
            ws.append((f"{p}.{mod}.linear.weight", w))
            if zero_plora or fold_plora:
                a, b = np.zeros_like(a), np.zeros_like(b)
            ws += [(f"{p}.{mod}.Plora_A.weight", a),
                   (f"{p}.{mod}.Plora_B.weight", b)]
    return ws


def _forward_logits(model, params, token_ids, prompt_embeds=None,
                    embeds_mask=None):
    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  padded_head_size)
    n = len(token_ids)
    kv_shape = (model.num_layers, 8, model.num_kv_heads, 16,
                padded_head_size(model.head_dim))
    kv = (jnp.zeros(kv_shape, jnp.float32),
          jnp.zeros(kv_shape, jnp.float32))
    dev = jax.tree.map(jnp.asarray, params,
                       is_leaf=lambda x: isinstance(x, np.ndarray))
    md = AttentionMetadata(
        slot_mapping=jnp.arange(n, dtype=jnp.int32),
        block_tables=jnp.arange(8, dtype=jnp.int32)[None],
        context_lens=jnp.asarray([n], jnp.int32),
        query_lens=jnp.asarray([n], jnp.int32))
    kwargs = {}
    if prompt_embeds is not None:
        kwargs = dict(prompt_embeds=jnp.asarray(prompt_embeds)[None],
                      embeds_mask=jnp.asarray(embeds_mask)[None])
    hidden, _ = model.forward(dev, kv,
                              jnp.asarray(token_ids, jnp.int32)[None],
                              jnp.arange(n, dtype=jnp.int32)[None], md,
                              **kwargs)
    return np.asarray(
        model.compute_logits(dev, hidden.reshape(n, -1)))


def _build(weights):
    from vllm_legacy_tpu.models.internlm_xcomposer2 import (
        InternLMXComposer2ForCausalLM)
    model = InternLMXComposer2ForCausalLM(_cfg(), dtype=jnp.float32)
    model.PLORA_R = R
    return model, model.load_weights(iter(weights))


def test_loader_mapping_and_plora_split():
    """Sentinel q/k/v rows survive the grouped wqkv + Plora_B split;
    Plora_A is shared; encoder tensors are skipped."""
    rng = np.random.RandomState(0)
    ws = []
    for name, w in _xc2_weights(rng):
        if name.endswith("wqkv.linear.weight"):
            w = np.concatenate([
                np.full((NKV, G, D, H), 1.0),
                np.full((NKV, 1, D, H), 2.0),
                np.full((NKV, 1, D, H), 3.0)
            ], axis=1).reshape(-1, H).astype(np.float32)
        if name.endswith("wqkv.Plora_B.weight"):
            w = np.concatenate([
                np.full((NKV, G, D, R), 4.0),
                np.full((NKV, 1, D, R), 5.0),
                np.full((NKV, 1, D, R), 6.0)
            ], axis=1).reshape(-1, R).astype(np.float32)
        ws.append((name, w))
    model, params = _build(ws)
    lp = params["layers"][0]
    assert np.allclose(lp["q_proj"]["weight"], 1.0)
    assert np.allclose(lp["k_proj"]["weight"], 2.0)
    assert np.allclose(lp["v_proj"]["weight"], 3.0)
    assert np.allclose(lp["q_proj"]["plora_b"], 4.0)
    assert np.allclose(lp["k_proj"]["plora_b"], 5.0)
    assert np.allclose(lp["v_proj"]["plora_b"], 6.0)
    assert lp["q_proj"]["plora_a"].shape == (H, R)
    assert np.array_equal(np.asarray(lp["q_proj"]["plora_a"]),
                          np.asarray(lp["v_proj"]["plora_a"]))
    for proj in ("o_proj", "gate_proj", "up_proj", "down_proj"):
        assert lp[proj]["plora_a"].shape[1] == R
        assert lp[proj]["plora_b"].shape[0] == R


def test_plora_matches_folded_weights():
    """im_mask on every token == adapter folded into the base weights;
    no mask == ploras ignored entirely."""
    toks = [3, 7, 11, 13, 5, 2, 9, 1]
    rng = np.random.RandomState(1)
    model, params = _build(_xc2_weights(rng))
    rng = np.random.RandomState(1)  # same draws -> same base + ploras
    folded_model, folded = _build(_xc2_weights(rng, fold_plora=True))

    # prompt_embeds = the true embedding rows -> substitution is a
    # no-op and only the PLoRA gating differs
    emb_rows = np.asarray(params["embed"]["weight"])[toks]
    mask = np.ones(len(toks), bool)
    with_lora = _forward_logits(model, params, toks,
                                prompt_embeds=emb_rows,
                                embeds_mask=mask)
    want = _forward_logits(folded_model, folded, toks)
    np.testing.assert_allclose(with_lora, want, atol=2e-4, rtol=1e-3)

    # mask everywhere False -> identical to the plain token path
    no_lora = _forward_logits(model, params, toks,
                              prompt_embeds=np.zeros_like(emb_rows),
                              embeds_mask=np.zeros(len(toks), bool))
    plain = _forward_logits(model, params, toks)
    np.testing.assert_allclose(no_lora, plain, atol=1e-6)
    # and the adapter actually does something
    assert np.abs(with_lora - plain).max() > 1e-4


def _save_ckpt(path, cfg_dict, state):
    from tests.models.test_arctic_decilm import (save_checkpoint)
    save_checkpoint(path, cfg_dict, state)


def test_engine_no_image_matches_llama(tmp_path):
    """Text-only prompts through the LLM API == degrouped-Llama run of
    the same base weights (validates the config shim + remap e2e)."""
    rng = np.random.RandomState(2)
    xc_state = {
        name: w
        for name, w in _xc2_weights(rng, zero_plora=True)
        if not name.startswith(("vit.", "vision_proj.", "plora_"))
    }
    xc_cfg = dict(architectures=["InternLMXComposer2ForCausalLM"],
                  model_type="internlmxcomposer2", vocab_size=V,
                  hidden_size=H, intermediate_size=INTER,
                  num_hidden_layers=NL, num_attention_heads=NQ,
                  num_key_value_heads=NKV, max_position_embeddings=128,
                  rms_norm_eps=1e-6, rope_theta=10000.0, bias=False,
                  torch_dtype="float32", bos_token_id=1, eos_token_id=2)
    _save_ckpt(tmp_path / "xc2", xc_cfg, xc_state)

    llama_state = {
        "model.embed_tokens.weight":
        xc_state["model.tok_embeddings.weight"],
        "model.norm.weight": xc_state["model.norm.weight"],
        "lm_head.weight": xc_state["output.weight"],
    }
    for i in range(NL):
        p = f"model.layers.{i}."
        x = f"model.layers.{i}."
        fused = xc_state[x + "attention.wqkv.linear.weight"]
        grp = fused.reshape(NKV, G + 2, D, H)
        llama_state[p + "self_attn.q_proj.weight"] = \
            grp[:, :G].reshape(NQ * D, H)
        llama_state[p + "self_attn.k_proj.weight"] = \
            grp[:, G].reshape(NKV * D, H)
        llama_state[p + "self_attn.v_proj.weight"] = \
            grp[:, G + 1].reshape(NKV * D, H)
        llama_state[p + "self_attn.o_proj.weight"] = \
            xc_state[x + "attention.wo.linear.weight"]
        llama_state[p + "mlp.gate_proj.weight"] = \
            xc_state[x + "feed_forward.w1.linear.weight"]
        llama_state[p + "mlp.up_proj.weight"] = \
            xc_state[x + "feed_forward.w3.linear.weight"]
        llama_state[p + "mlp.down_proj.weight"] = \
            xc_state[x + "feed_forward.w2.linear.weight"]
        llama_state[p + "input_layernorm.weight"] = \
            xc_state[x + "attention_norm.weight"]
        llama_state[p + "post_attention_layernorm.weight"] = \
            xc_state[x + "ffn_norm.weight"]
    llama_cfg = dict(xc_cfg, architectures=["LlamaForCausalLM"],
                     model_type="llama")
    del llama_cfg["bias"]
    _save_ckpt(tmp_path / "llama", llama_cfg, llama_state)

    from vllm_legacy_tpu import LLM, SamplingParams

    def gen(path, mm=None):
        llm = LLM(model=str(path), dtype="float32", max_model_len=128,
                  num_tpu_blocks_override=128, disable_log_stats=True)
        sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                            ignore_eos=True, detokenize=False)
        if mm is None:
            outs = llm.generate(PROMPTS, sp, use_tqdm=False)
        else:
            outs = llm.generate(prompts=mm, sampling_params=sp,
                                use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    assert gen(tmp_path / "xc2") == gen(tmp_path / "llama")

    # engine path with prompt_embeds: substituted rows change the
    # output; the run is deterministic
    ids = [3, 7, 11, 13, 5]
    rng = np.random.RandomState(3)
    pe = rng.standard_normal((len(ids), H)).astype(np.float32) * 0.3
    mask = np.asarray([False, True, True, False, False])
    mm = [{
        "prompt_token_ids": ids,
        "multi_modal_data": {"prompt_embeds": pe, "embeds_mask": mask},
    }]
    with_emb = gen(tmp_path / "xc2", mm=mm)
    assert with_emb == gen(tmp_path / "xc2", mm=mm)  # deterministic
    plain = gen(tmp_path / "xc2",
                mm=[{"prompt_token_ids": ids}])
    assert with_emb != plain


def test_image_encoder_layout():
    from transformers import CLIPVisionConfig

    from vllm_legacy_tpu.engine.image_encoder import (ImageEncoder,
                                                      hd_transform)
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2,
                              num_attention_heads=4, image_size=32,
                              patch_size=8)
    enc = ImageEncoder(vision, lm_hidden=48, hd_num=6)
    enc.init_dummy_params(0)

    rng = np.random.RandomState(0)
    img = rng.rand(40, 70, 3).astype(np.float32)
    tiles, h, w = hd_transform(img, tile=32, hd_num=6)
    assert tiles.shape == (h * w, 3, 32, 32)
    assert 0 < h * w <= 6

    out = enc.encode(img)
    m = enc.merged  # 2
    assert out.shape == (enc.num_tokens(h, w), 48)
    assert enc.num_tokens(h, w) == (h * w + 1) * m * m + 1 + (h + 1) * m
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, enc.encode(img))  # deterministic


def test_splice_images():
    from vllm_legacy_tpu.engine.image_encoder import splice_images
    emb = np.ones((4, 8), np.float32)
    out = splice_images([1, 2, 99, 3], [emb],
                        placeholder_token_id=0, marker_token_id=99)
    assert out["prompt_token_ids"] == [1, 2, 0, 0, 0, 0, 3]
    mm = out["multi_modal_data"]
    np.testing.assert_array_equal(
        mm["embeds_mask"],
        [False, False, True, True, True, True, False])
    assert mm["prompt_embeds"].shape == (7, 8)
    np.testing.assert_array_equal(mm["prompt_embeds"][2:6], emb)
    assert (mm["prompt_embeds"][[0, 1, 6]] == 0).all()

    with pytest.raises(ValueError, match="1 image markers"):
        splice_images([1, 99, 2], [emb, emb],
                      placeholder_token_id=0, marker_token_id=99)
    assert splice_images([1, 2], [], placeholder_token_id=0,
                         marker_token_id=99) == {
                             "prompt_token_ids": [1, 2]}


def test_make_prompt_parses_images():
    pytest.importorskip("PIL")
    from base64 import b64encode
    from io import BytesIO

    from PIL import Image

    from vllm_legacy_tpu.entrypoints.openai.make_prompt import (
        IMAGE_MARKER, make_prompt)

    buf = BytesIO()
    Image.fromarray(
        np.full((20, 24, 3), 128, np.uint8)).save(buf, format="PNG")
    b64 = b64encode(buf.getvalue()).decode()

    class Tok:
        name_or_path = "internlm/internlm-xcomposer2-7b"
        chat_template = None

        def apply_chat_template(self, conversation, tokenize,
                                add_generation_prompt):
            return "\n".join(m["content"] for m in conversation)

    req = types.SimpleNamespace(
        messages=[
            {"role": "user",
             "content": f"look: ![img](data:image/png;base64,{b64})"},
            {"role": "user",
             "content": [
                 {"type": "text", "text": "and this"},
                 {"type": "image_url",
                  "image_url": {"url": f"data:image/png;base64,{b64}"}},
             ]},
        ],
        add_generation_prompt=True)
    prompt, images = make_prompt(req, Tok())
    assert prompt.count(IMAGE_MARKER) == 2
    assert len(images) == 2
    assert images[0].shape == (20, 24, 3)
