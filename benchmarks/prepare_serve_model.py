"""Materialize a weights-free TinyLlama-1.1B model directory for the
on-chip serving benchmark: config.json + a local BPE tokenizer, served
with ``--load-format dummy`` (zero egress; weights are random on
device, which exercises the full engine + kernels + serving stack —
numbers measure the engine, not model quality).

Usage: python benchmarks/prepare_serve_model.py [out_dir]
"""
import sys


def build(out_dir: str) -> str:
    import os

    from transformers import LlamaConfig

    os.makedirs(out_dir, exist_ok=True)
    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=22,
        num_attention_heads=32,
        num_key_value_heads=4,
        max_position_embeddings=2048,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        architectures=["LlamaForCausalLM"],
    )
    cfg.save_pretrained(out_dir)

    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=2048, special_tokens=["<unk>", "<s>", "</s>"])
    corpus = ["the quick brown fox jumps over the lazy dog",
              "benchmark prompt x serving latency throughput",
              " ".join(f"tok{i}" for i in range(512))]
    tok.train_from_iterator(corpus, trainer)
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>", bos_token="<s>",
                                   eos_token="</s>")
    fast.save_pretrained(out_dir)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vlt_serve_tinyllama"
    print(build(out))
