"""Speculative decoding (reference: vllm/spec_decode/ — SURVEY.md §2.9).

TPU redesign: instead of a worker-wrapping-workers RPC facade
(SpecDecodeWorker :58 wrapping scorer+proposer workers), proposal,
scoring and verification are one jitted step on the mesh:

* proposals come from the host-side n-gram prompt-lookup (ngram.py) or
  a draft model (future round);
* scoring reuses the unified paged-attention kernel with per-sequence
  query lengths — sequences WITHOUT a proposal decode normally in the
  same batch (qlen=1), replacing the reference's batch-expansion
  machinery (batch_expansion.py:103-207) with ragged qlens;
* verification is the pure-JAX rejection sampler.
"""
from vllm_legacy_tpu.spec_decode.ngram import NGramProposer

__all__ = ["NGramProposer"]
