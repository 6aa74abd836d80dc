"""Llama-family causal LM (Llama 1/2/3, TinyLlama, Mistral, Qwen2).

Capability parity with the reference's ``vllm/model_executor/models/
llama.py`` (:54-493, forward :389/:302, load_weights :409) — redesigned as
pure functions over a param pytree executed inside ``shard_map`` over the
("data", "model") mesh: column-parallel projections are plain matmuls on
head-sharded weights, row-parallel projections psum over the "model" axis
(replacing NCCL all-reduce), and attention runs the unified Pallas paged
kernel per shard.

One implementation serves Mistral (sliding_window) and Qwen2
(attention_bias) — the reference keeps three near-identical files.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import rms_norm
from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from vllm_legacy_tpu.models.attention import AttentionMetadata, attention
from vllm_legacy_tpu.utils import round_up


class LlamaForCausalLM:
    """Static model description + pure compute functions.

    Parameters live in a separate pytree (see :meth:`param_shapes`);
    global shapes — shard_map splits them with :meth:`param_specs`.
    """

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None) -> None:
        c = hf_config
        self.quant_config = quant_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        self.hidden_size = c.hidden_size
        self.num_layers = c.num_hidden_layers
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = getattr(c, "num_key_value_heads",
                                    None) or c.num_attention_heads
        self.head_dim = getattr(c, "head_dim", None) or (
            c.hidden_size // c.num_attention_heads)
        self.intermediate_size = c.intermediate_size
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.rms_eps = getattr(c, "rms_norm_eps", 1e-6)
        self.rope_theta = getattr(c, "rope_theta", 10000.0)
        self.rope_scaling = getattr(c, "rope_scaling", None)
        self.max_position = getattr(c, "max_position_embeddings", 4096)
        self.sliding_window = getattr(c, "sliding_window", None)
        self.rotary_dim = self.head_dim  # partial-rotary models override
        # models applying rope themselves inside _project_qkv (ChatGLM's
        # interleaved half-dim rope) set this True
        self.rope_in_projection = False
        self.attention_bias = bool(
            getattr(c, "attention_bias", False)
            or getattr(c, "use_qkv_bias", False)
            or c.architectures[0] == "Qwen2ForCausalLM"
            if getattr(c, "architectures", None) else
            getattr(c, "attention_bias", False))
        self.tie_word_embeddings = bool(
            getattr(c, "tie_word_embeddings", False))
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            # kv-head replication for tp > num_kv_heads is not wired
            # into the cache sharding yet; require clean division.
            raise ValueError(
                f"num_kv_heads={self.num_kv_heads} must be divisible by "
                f"tensor parallel size {tp_size}")

    # ------------------------------------------------------------------
    # Param structure
    # ------------------------------------------------------------------
    def _layer_shapes(self) -> Dict[str, Any]:
        h, d = self.hidden_size, self.head_dim
        nq, nkv, inter = self.num_heads, self.num_kv_heads, \
            self.intermediate_size
        shapes = {
            "input_layernorm": {"weight": ((h, ), self.dtype)},
            "q_proj": {"weight": ((h, nq * d), self.dtype)},
            "k_proj": {"weight": ((h, nkv * d), self.dtype)},
            "v_proj": {"weight": ((h, nkv * d), self.dtype)},
            "o_proj": {"weight": ((nq * d, h), self.dtype)},
            "post_attention_layernorm": {"weight": ((h, ), self.dtype)},
            "gate_proj": {"weight": ((h, inter), self.dtype)},
            "up_proj": {"weight": ((h, inter), self.dtype)},
            "down_proj": {"weight": ((inter, h), self.dtype)},
        }
        if self.attention_bias:
            for name, n_out in (("q_proj", nq * d), ("k_proj", nkv * d),
                                ("v_proj", nkv * d)):
                shapes[name]["bias"] = ((n_out, ), self.dtype)
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        """Pytree of (shape, dtype) mirroring the param pytree."""
        return {
            "embed": {"weight": ((self.vocab_size, self.hidden_size),
                                 self.dtype)},
            "layers": [self._layer_shapes() for _ in range(self.num_layers)],
            "norm": {"weight": ((self.hidden_size, ), self.dtype)},
            "lm_head": {"weight": ((self.vocab_size, self.hidden_size),
                                   self.dtype)},
            "rope_cache": ((0, ), jnp.float32),  # shape set lazily below
        }

    def make_rope_cache(self) -> np.ndarray:
        return build_cos_sin_cache(self.head_dim, self.rotary_dim,
                                   self.max_position, self.rope_theta,
                                   self.rope_scaling)

    # Projections sharded on their OUTPUT axis ("column" parallel) vs
    # their INPUT axis ("row" parallel, psum after matmul).
    _COL_PROJS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    _ROW_PROJS = ("o_proj", "down_proj")

    @staticmethod
    def _proj_entry_spec(mode: str, key: str) -> P:
        """Spec for one tensor of a linear, dense or quantized
        (qweight/scales/szeros share the weight's sharding axis)."""
        if key in ("weight", "qweight", "scales", "szeros", "fpq",
                   "fpscales"):
            return P(None, "model") if mode == "column" else P("model",
                                                               None)
        if key == "codes":  # AQLM out-major [NO, NI, CB]
            return P("model", None, None) if mode == "column" else \
                P(None, "model", None)
        if key == "oscales":  # per-out-channel scales
            return P("model") if mode == "column" else P()
        if key == "bias":
            return P("model") if mode == "column" else P()
        # Partial-LoRA (XComposer2): A shards on the contraction dim for
        # row layers, B on the output dim for column layers; the rank dim
        # stays replicated either way.
        if key == "plora_a":
            return P() if mode == "column" else P("model", None)
        if key == "plora_b":
            return P(None, "model") if mode == "column" else P()
        # stacked multi-LoRA [S, in, r] / [S, r, out]: shard like the
        # base weight (A on contraction for row, B on output for column)
        if key == "lora_a":
            return P() if mode == "column" else P(None, "model", None)
        if key == "lora_b":
            return P(None, None, "model") if mode == "column" else P()
        return P()  # in_perm, weight_scale, lora_scale: replicated

    def param_specs(self,
                    params: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
        """PartitionSpec pytree mirroring the (loaded) param structure.

        When ``params`` is given the spec tree matches it exactly —
        required because quantized layers carry different keys than
        dense ones (shard_map in_specs must be structure-identical).
        """
        if params is None:
            params = {
                "embed": {"weight": None},
                "layers": [{
                    "input_layernorm": {"weight": None},
                    **{p: {"weight": None}
                       for p in self._COL_PROJS + self._ROW_PROJS},
                    "post_attention_layernorm": {"weight": None},
                } for _ in range(self.num_layers)],
                "norm": {"weight": None},
                "lm_head": {"weight": None},
                "rope_cache": None,
            }

        def layer_spec(lp):
            spec = {}
            for proj, tensors in lp.items():
                if "norm" in proj or proj.startswith("ln"):
                    spec[proj] = {k: P() for k in tensors}
                    continue
                mode = "column" if proj in self._COL_PROJS else "row"
                spec[proj] = {
                    k: self._proj_entry_spec(mode, k)
                    for k in tensors
                }
            return spec

        return {
            "embed": {"weight": P("model", None)},
            "layers": [layer_spec(lp) for lp in params["layers"]],
            "norm": {k: P() for k in params["norm"]},
            "lm_head": {"weight": P("model", None)},
            "rope_cache": P(),
        }

    # ------------------------------------------------------------------
    # Forward (runs INSIDE shard_map; all params/caches are local shards)
    # ------------------------------------------------------------------
    def _decoder_layer(self, p, hidden, residual, q_pos, rope_cache,
                       kv_caches, md, layer_idx, lora_indices=None):
        b, l, h = hidden.shape
        if residual is None:
            residual = hidden
            x = self._norm(hidden, p["input_layernorm"])
        else:
            x, residual = self._norm(hidden, p["input_layernorm"],
                                     residual=residual)
        xf = x.reshape(b * l, h)
        q, k, v = self._project_qkv(p, xf, lora_indices)
        se_spec = self._self_extend_spec()
        alibi = getattr(self, "_alibi_slopes", None)
        if se_spec is None and alibi is None and \
                not self.rope_in_projection:
            q, k = apply_rope(q, k, q_pos, rope_cache,
                              rotary_dim=self.rotary_dim)
        q = q.reshape(b, l, -1, self.head_dim)
        k = k.reshape(b, l, -1, self.head_dim)
        v = v.reshape(b, l, -1, self.head_dim)
        kv_scale = p["kv_scale"]["scale"] if "kv_scale" in p else None
        attn_out, kv_caches = attention(
            q, k, v, kv_caches, md, scale=self.scale,
            layer_idx=layer_idx, sliding_window=self.sliding_window,
            sparse=getattr(self, "sparse_config", None),
            self_extend=se_spec, alibi_slopes=alibi,
            blocksparse=self._blocksparse(layer_idx),
            kv_scale=kv_scale)
        o = self._o_proj(p, attn_out.reshape(b * l, -1), lora_indices)
        hidden = o.reshape(b, l, h)

        x, residual = self._norm(hidden, p["post_attention_layernorm"],
                                 residual=residual)
        down = self._mlp(p, x.reshape(b * l, h),
                         lora_indices=lora_indices)
        hidden = down.reshape(b, l, h)
        return hidden, residual, kv_caches

    def _o_proj(self, p, attn_flat, lora_indices=None):
        """Attention output projection hook; XComposer2 overrides to add
        its partial-LoRA delta."""
        return row_parallel_linear(attn_flat, p["o_proj"],
                                   tp_size=self.tp_size,
                                   lora_indices=lora_indices)

    def _project_qkv(self, p, xf, lora_indices=None):
        """QKV projection hook ([T, Hq/Hkv, D] each); OLMo overrides to
        clip, Cohere to q/k-norm."""
        li = lora_indices
        q = linear(xf, p["q_proj"], lora_indices=li).reshape(
            xf.shape[0], -1, self.head_dim)
        k = linear(xf, p["k_proj"], lora_indices=li).reshape(
            xf.shape[0], -1, self.head_dim)
        v = linear(xf, p["v_proj"], lora_indices=li).reshape(
            xf.shape[0], -1, self.head_dim)
        return q, k, v

    def _blocksparse(self, layer_idx):
        """Per-layer blocksparse mask spec; Phi-3-Small overrides
        (models/phi3_small.py)."""
        return None

    def _self_extend_spec(self):
        """Self-extend RoPE config (fork SE_SCALE/SE_WINDOW,
        attention/backends/hip.py:109-113), set by the loader from
        ModelConfig.self_extend as (window, group)."""
        cfg = getattr(self, "self_extend", None)
        if cfg is None:
            return None
        from vllm_legacy_tpu.ops.self_extend import SelfExtendSpec
        window, group = cfg
        return SelfExtendSpec(window=window, group=group,
                              rotary_dim=self.head_dim,
                              rope_base=self.rope_theta)

    def _norm(self, x, norm_params, residual=None):
        """Norm hook taking the layer's norm param dict; Gemma overrides
        with its (1+w) RMS variant, StableLM/Orion with LayerNorm."""
        return rms_norm(x, norm_params["weight"], eps=self.rms_eps,
                        residual=residual)

    def _mlp(self, p, xf, lora_indices=None):
        """SwiGLU MLP; MoE models override (mixtral.py)."""
        gate = linear(xf, p["gate_proj"], lora_indices=lora_indices)
        up = linear(xf, p["up_proj"], lora_indices=lora_indices)
        mlp = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
        return row_parallel_linear(mlp, p["down_proj"],
                                   tp_size=self.tp_size,
                                   lora_indices=lora_indices)

    def forward(
        self,
        params: Dict[str, Any],
        kv_caches: Tuple[jax.Array, jax.Array],  # stacked [L,H,N,bs,D]
        token_ids: jax.Array,  # [B, L] int32
        positions: jax.Array,  # [B, L] int32
        md: AttentionMetadata,
        lora_indices=None,
        prompt_embeds=None,  # [B, L, H] f32, rows where embeds_mask
        embeds_mask=None,  # [B, L] bool
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        b, l = token_ids.shape
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size)
        hidden = hidden.reshape(b, l, self.hidden_size)
        if prompt_embeds is not None:
            # precomputed-embedding substitution (reference capability:
            # Sequence.prompt_embeds, vllm/sequence.py:125; XComposer2
            # overrides this to also gate its PLoRA on the mask)
            hidden = jnp.where(embeds_mask[:, :, None],
                               prompt_embeds.astype(hidden.dtype),
                               hidden)
        return self.forward_embedded(params, kv_caches, hidden,
                                     positions, md,
                                     lora_indices=lora_indices)

    def forward_embedded(self, params, kv_caches, hidden, positions, md,
                         lora_indices=None):
        """Decoder stack from pre-computed embeddings (multimodal
        models substitute image features before calling this)."""
        # ALiBi models (Baichuan-13B, Jais) carry slopes in the params
        # pytree (sharded P("model")) and skip rope entirely.
        self._alibi_slopes = params.get("alibi_slopes")
        q_pos = jnp.clip(positions.reshape(-1), 0,
                         params["rope_cache"].shape[0] - 1)
        residual = None
        for i in range(self.num_layers):
            hidden, residual, kv_caches = self._decoder_layer(
                params["layers"][i], hidden, residual, q_pos,
                params["rope_cache"], kv_caches, md, i,
                lora_indices=lora_indices)
        hidden, _ = self._norm(hidden, params["norm"],
                               residual=residual)
        return hidden, kv_caches

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        """[T, H] -> [T, vocab_padded] f32; padded ids masked to -inf."""
        logits = embedding.compute_logits(params["lm_head"], hidden,
                                          tp_size=self.tp_size)
        if self.vocab_size != self.org_vocab_size:
            neg = jnp.finfo(jnp.float32).min
            mask = jnp.arange(self.vocab_size) >= self.org_vocab_size
            logits = jnp.where(mask[None, :], neg, logits)
        return logits

    def _np_dtype(self):
        import ml_dtypes
        return (ml_dtypes.bfloat16
                if self.dtype == jnp.bfloat16 else np.float32)

    # ------------------------------------------------------------------
    # Weight loading (host side, numpy)
    # ------------------------------------------------------------------
    def load_weights(
        self, weights: Iterable[Tuple[str, np.ndarray]]
    ) -> Dict[str, Any]:
        """HF checkpoint names -> param pytree (reference:
        models/llama.py load_weights :409; fused-shard mapping is not
        needed because projections stay separate — fusion is XLA's job).
        """
        import ml_dtypes
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        params: Dict[str, Any] = {
            "embed": {},
            "layers": [dict() for _ in range(self.num_layers)],
            "norm": {},
            "lm_head": {},
        }

        # Quantized checkpoints carry qweight/qzeros/scales/g_idx (or
        # codes/codebooks for AQLM) per projection; collect raw tensors
        # first, convert per-layer after. These kinds keep their
        # checkpoint dtype (the converters cast as needed).
        quant_kinds = ("qweight", "qzeros", "scales", "g_idx",
                       "lookup_table", "codes", "codebooks",
                       "weight_scale", "input_scale",
                       "weight_zero_point", "input_zero_point",
                       # marlin-serialized (dense B/s, 2:4 B_24/B_meta)
                       "B", "B_24", "B_meta", "s")

        for name, w in weights:
            if name.endswith("rotary_emb.inv_freq"):
                continue
            if name.endswith(".workspace"):
                continue  # marlin GPU scratch; meaningless on TPU
            w = np.asarray(w)
            kind = name.split(".")[-1]
            if (w.dtype != np_dtype and w.dtype.kind == "f"
                    and kind not in quant_kinds):
                w = w.astype(np_dtype)
            if name == "model.embed_tokens.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
                continue
            if name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
                continue
            if name in ("model.norm.weight", "model.norm.bias"):
                params["norm"][name.split(".")[-1]] = w
                continue
            if not name.startswith("model.layers."):
                continue
            parts = name.split(".")
            idx = int(parts[2])
            sub = parts[3]  # self_attn | mlp | input_layernorm | post_...
            lp = params["layers"][idx]
            if "layernorm" in sub or sub.endswith("norm"):
                lp.setdefault(sub, {})[parts[4]] = w
            elif sub in ("self_attn", "mlp"):
                if parts[-1] in ("kv_scale", "k_scale", "v_scale"):
                    # FP8 KV dequant scale (reference llama.py:449-460
                    # remaps *.kv_scale -> attn.kv_scale; k/v share one
                    # scalar in the 0.4.3 schema — take the max when a
                    # ckpt carries split scales)
                    prev = lp.get("kv_scale", {}).get("scale")
                    val = np.float32(np.asarray(w).reshape(-1)[0])
                    if prev is not None:
                        val = np.maximum(prev, val)
                    lp["kv_scale"] = {"scale": val}
                    continue
                proj = parts[4]  # q_proj etc.
                kind = parts[5]  # weight | bias | qweight | ...
                if kind == "weight":
                    lp.setdefault(proj, {})["weight"] = w.T
                else:
                    lp.setdefault(proj, {})[kind] = w

        if self.quant_config is not None:
            self._convert_quant_layers(params, np_dtype)
        if self.tie_word_embeddings or "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed"]["weight"]
        params["rope_cache"] = self.make_rope_cache()
        return params

    def load_kv_cache_scales(self, params: Dict[str, Any], path: str,
                             tp_rank: int = 0) -> None:
        """Populate per-layer FP8 KV scales from a serialized JSON
        (reference: kv_cache_scales_loader, weight_utils.py:365 and
        llama.py:477-493; schema from examples/fp8/extract_scales.py:
        {"kv_cache": {"scaling_factor": {tp_rank: {layer: s}}}})."""
        import json
        with open(path) as f:
            schema = json.load(f)
        factors = schema["kv_cache"]["scaling_factor"]
        rank_map = factors.get(str(tp_rank), factors.get(tp_rank))
        if rank_map is None:
            raise ValueError(
                f"no KV scales for tp_rank {tp_rank} in {path}")
        for idx, scale in rank_map.items():
            params["layers"][int(idx)]["kv_scale"] = {
                "scale": np.float32(scale)}

    def _convert_quant_layers(self, params: Dict[str, Any],
                              np_dtype) -> None:
        """Repack checkpoint quant tensors into device-ready layouts via
        the config's conversion protocol (base_config.wants /
        convert_layer_params — GPTQ/AWQ/SqueezeLLM repack to the common
        packed layout, AQLM/DeepSpeedFP/compressed-tensors to their own
        LinearMethod params)."""
        cfg = self.quant_config
        for lp in params["layers"]:
            for proj, tensors in lp.items():
                if not isinstance(tensors, dict) or "norm" in proj \
                        or proj.endswith("norm"):
                    continue
                if not cfg.wants(tensors):
                    continue
                bias = tensors.pop("bias", None)
                k_shards = (self.tp_size
                            if proj in self._ROW_PROJS else 1)
                new = cfg.convert_layer_params(tensors, np_dtype,
                                               k_shards=k_shards)
                tensors.clear()
                tensors.update(new)
                if bias is not None:
                    tensors["bias"] = bias

    def _pad_vocab(self, w: np.ndarray) -> np.ndarray:
        if w.shape[0] < self.vocab_size:
            w = np.pad(w, ((0, self.vocab_size - w.shape[0]), (0, 0)))
        return w

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random-weight init (reference: DummyModelLoader,
        model_loader/loader.py:261) — host numpy, cheap and seedable."""
        import ml_dtypes

        from vllm_legacy_tpu.models.base import make_noise_fn
        rng = np.random.RandomState(seed)
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        noise = make_noise_fn(rng, 1e-2, np_dtype)

        def make(tree):
            if isinstance(tree, dict):
                return {k: make(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [make(v) for v in tree]
            shape, _ = tree
            return noise(shape)

        shapes = self.param_shapes()
        shapes.pop("rope_cache")
        constants = {}
        if hasattr(self, "constant_params"):
            constants = self.constant_params()
        for k in constants:
            shapes.pop(k, None)
        if self.quant_config is not None:
            # Emit the linears directly in device-ready packed layout
            # (quantized analogue of DummyModelLoader) so full-scale
            # quantized benchmarks need no checkpoint. Identical shapes
            # share arrays — the values are noise either way and 7B of
            # fresh bytes costs tens of host-seconds.
            cache: Dict[tuple, Dict[str, Any]] = {}
            for lp in shapes["layers"]:
                for proj in self._COL_PROJS + self._ROW_PROJS:
                    if proj not in lp or "weight" not in lp[proj]:
                        continue
                    (k_in, n_out), _ = lp[proj]["weight"]
                    k_shards = (self.tp_size
                                if proj in self._ROW_PROJS else 1)
                    if (k_in, n_out) not in cache:
                        cache[(k_in, n_out)] = \
                            self.quant_config.dummy_packed_params(
                                k_in, n_out, rng, k_shards=k_shards)
                    packed = dict(cache[(k_in, n_out)])
                    if "bias" in lp[proj]:
                        packed["bias"] = lp[proj]["bias"]
                    lp[proj] = packed
            # split mixed dict: packed arrays pass through, (shape,
            # dtype) leaves still get random init
            def make_mixed(tree):
                if isinstance(tree, dict):
                    return {k: make_mixed(v) for k, v in tree.items()}
                if isinstance(tree, list):
                    return [make_mixed(v) for v in tree]
                if isinstance(tree, np.ndarray):
                    return tree
                return make(tree)

            params = make_mixed(shapes)
        else:
            params = make(shapes)
        params["rope_cache"] = self.make_rope_cache()
        params.update(constants)
        return params
