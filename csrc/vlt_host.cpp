// Native host-path helpers (role of the reference's csrc/ for the HOST
// side: the hot per-step Python loops that are not TPU work).
//
// - Chained per-block content hashes for prefix caching
//   (reference: vllm/sequence.py Sequence.hash_of_block:281, which
//   re-hashes the whole prefix tuple per block -> O(prompt^2); here an
//   FNV-1a chain is O(block) per block).
// - N-gram prompt-lookup proposal scan for speculative decoding
//   (reference: vllm/spec_decode/ngram_worker.py:69-155).
//
// Exposed with a plain C ABI consumed via ctypes
// (vllm_legacy_tpu/native/__init__.py); no pybind11 in the image.

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t kFnvOffset = 1469598103934665603ULL;
constexpr uint64_t kFnvPrime = 1099511628211ULL;

inline uint64_t fnv1a_step(uint64_t h, uint64_t v) {
  for (int i = 0; i < 8; ++i) {
    h ^= (v >> (i * 8)) & 0xffULL;
    h *= kFnvPrime;
  }
  return h;
}

}  // namespace

extern "C" {

// Extend a block-hash chain: returns hash(prev_hash, tokens[0..n)).
// Seed a chain with prev = vlt_hash_seed(lora_id).
uint64_t vlt_hash_seed(int64_t lora_id) {
  return fnv1a_step(kFnvOffset, static_cast<uint64_t>(lora_id));
}

uint64_t vlt_hash_block_chain(uint64_t prev, const int32_t* tokens,
                              int64_t n) {
  uint64_t h = fnv1a_step(prev, 0x9e3779b97f4a7c15ULL);
  for (int64_t i = 0; i < n; ++i) {
    h = fnv1a_step(h, static_cast<uint64_t>(
                          static_cast<uint32_t>(tokens[i])));
  }
  return h;
}

// Hash every complete block of a prompt in one pass.
// out must hold n_blocks entries; returns n_blocks actually written.
int64_t vlt_hash_prompt_blocks(const int32_t* tokens, int64_t n_tokens,
                               int64_t block_size, int64_t lora_id,
                               uint64_t* out) {
  int64_t n_blocks = n_tokens / block_size;
  uint64_t h = vlt_hash_seed(lora_id);
  for (int64_t b = 0; b < n_blocks; ++b) {
    h = vlt_hash_block_chain(h, tokens + b * block_size, block_size);
    out[b] = h;
  }
  return n_blocks;
}

// Prompt-lookup n-gram proposer: find the most recent earlier
// occurrence of the trailing n-gram (longest n in [nmin, nmax] first)
// and copy up to k continuation tokens into out. Returns the number of
// proposal tokens (0 = no match).
int64_t vlt_ngram_propose(const int32_t* tokens, int64_t n,
                          int64_t nmin, int64_t nmax, int64_t k,
                          int32_t* out) {
  if (nmin < 1) nmin = 1;
  if (n < nmin + 1) return 0;
  if (nmax > n - 1) nmax = n - 1;
  for (int64_t len = nmax; len >= nmin; --len) {
    const int32_t* pattern = tokens + (n - len);
    // scan candidate start positions from most recent to oldest; the
    // match must end before the final token (start + len <= n - 1)
    for (int64_t start = n - 1 - len; start >= 0; --start) {
      if (std::memcmp(tokens + start, pattern,
                      sizeof(int32_t) * len) == 0) {
        int64_t copy_from = start + len;
        int64_t count = n - copy_from;
        if (count > k) count = k;
        if (count <= 0) break;  // match ends at the tail; try shorter n
        std::memcpy(out, tokens + copy_from, sizeof(int32_t) * count);
        return count;
      }
    }
  }
  return 0;
}

}  // extern "C"
