"""Native host library vs Python reference (csrc/vlt_host.cpp)."""
import numpy as np

_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_MASK = (1 << 64) - 1
_CHAIN_SALT = 0x9e3779b97f4a7c15


def _ref_step(h, v):
    for i in range(8):
        h ^= (v >> (i * 8)) & 0xFF
        h = (h * _FNV_PRIME) & _MASK
    return h


def _ref_seed(lora):
    return _ref_step(_FNV_OFFSET, lora & _MASK)


def _ref_chain(prev, tokens):
    h = _ref_step(prev, _CHAIN_SALT)
    for t in tokens:
        h = _ref_step(h, int(t) & 0xFFFFFFFF)
    return h


def _ref_ngram(toks, nmin, nmax, k):
    n = len(toks)
    nmin = max(nmin, 1)
    if n < nmin + 1:
        return None
    for length in range(min(nmax, n - 1), nmin - 1, -1):
        pattern = toks[n - length:]
        for start in range(n - 1 - length, -1, -1):
            if toks[start:start + length] == pattern:
                proposal = toks[start + length:start + length + k]
                if not proposal:
                    break
                return proposal
    return None


def test_native_builds_and_loads():
    from vllm_legacy_tpu import native
    assert native.native_available(), "g++ build failed"


def test_hash_chain_native_equals_reference():
    from vllm_legacy_tpu import native
    assert native.native_available()
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 32000, size=64).tolist()
    for lora in (0, 7):
        h = native.hash_seed(lora)
        assert h == _ref_seed(lora)
        h = native.hash_block_chain(h, toks[:16])
        assert h == _ref_chain(_ref_seed(lora), toks[:16])
        h2 = native.hash_block_chain(h, toks[16:32])
        assert h2 == _ref_chain(h, toks[16:32])
    # same content -> same hash; different content -> different
    h1 = native.hash_block_chain(native.hash_seed(0), toks[:16])
    h2 = native.hash_block_chain(native.hash_seed(0), toks[:16])
    h3 = native.hash_block_chain(native.hash_seed(0), toks[16:32])
    assert h1 == h2 != h3


def test_ngram_native_equals_reference():
    from vllm_legacy_tpu.native import ngram_propose
    rng = np.random.RandomState(1)
    for trial in range(500):
        n = int(rng.randint(2, 80))
        vocab = int(rng.randint(2, 8))  # small vocab -> many matches
        toks = rng.randint(0, vocab, size=n).tolist()
        nmin = int(rng.randint(1, 3))
        nmax = int(rng.randint(nmin, nmin + 4))
        k = int(rng.randint(1, 6))
        got = ngram_propose(toks, nmin, nmax, k)
        want = _ref_ngram(toks, nmin, nmax, k)
        assert got == want, (trial, toks, nmin, nmax, k, got, want)


def test_prefix_hash_stable_across_calls():
    """Sequence.hash_of_block chain cache returns consistent values as
    blocks fill."""
    from vllm_legacy_tpu.sequence import Sequence
    toks = list(range(48))
    seq = Sequence(0, None, toks, 16, None)
    h0 = seq.hash_of_block(0)
    h1 = seq.hash_of_block(1)
    assert seq.hash_of_block(0) == h0
    assert seq.hash_of_block(1) == h1 != h0
    # an identical sequence hashes identically (prefix-cache key)
    seq2 = Sequence(1, None, list(toks), 16, None)
    assert seq2.hash_of_block(1) == h1
