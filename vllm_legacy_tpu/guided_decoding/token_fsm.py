"""Token-level FSM: char DFA x tokenizer vocab -> per-state mask rows.

Equivalent of outlines' ``RegexFSM`` machinery (reference:
vllm/model_executor/guided_decoding/outlines_logits_processors.py),
redesigned around arrays: each visited DFA state lazily materializes
a [V] next-state row by walking EVERY vocab token from that state at once
(vectorized numpy gathers over the [V, max_token_len] codepoint-class
matrix — ~0.1 ms for a 32k vocab). Rows are cached, so steady-state cost
per decode step is a dict hit + a [V] bool mask handed to the sampler.

Lazy rows matter: a generic-JSON DFA has ~20k states; dense [S, V] tables
would be GBs, while a request only ever visits O(generated tokens) states.
"""
from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from vllm_legacy_tpu.guided_decoding.regex_compiler import DFA, compile_regex
from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)


def _byte_level_decoder() -> Dict[str, int]:
    """GPT-2 byte-level BPE printable-unicode <-> byte map (the inverse of
    huggingface's bytes_to_unicode)."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def _decode_vocab(tokenizer: Any) -> List[Optional[str]]:
    """Token id -> the exact text the token contributes when decoded.

    Handles the two mainstream conventions: SentencePiece ("▁" = space,
    "<0xNN>" byte tokens) and GPT-2 byte-level BPE (printable-unicode byte
    aliases). Tokens whose bytes don't form valid UTF-8 on their own
    (continuation-byte fragments) and special tokens map to None and are
    never allowed by a guided mask (EOS is handled separately).
    """
    vocab_size = len(tokenizer)
    id_to_tok: Dict[int, str] = {
        tid: tok
        for tok, tid in tokenizer.get_vocab().items()
    }
    special_ids = set(tokenizer.all_special_ids or [])
    added = getattr(tokenizer, "added_tokens_decoder", {}) or {}
    for tid, added_tok in added.items():
        if getattr(added_tok, "special", False):
            special_ids.add(tid)

    toks = list(id_to_tok.values())
    spm_style = any("▁" in t for t in toks[:4096]) or any(
        t.startswith("<0x") for t in toks[:4096])
    byte_decoder = None if spm_style else _byte_level_decoder()

    out: List[Optional[str]] = [None] * vocab_size
    for tid in range(vocab_size):
        tok = id_to_tok.get(tid)
        if tok is None or tid in special_ids:
            continue
        if spm_style:
            if tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
                try:
                    out[tid] = bytes([int(tok[3:5], 16)]).decode("utf-8")
                except (ValueError, UnicodeDecodeError):
                    out[tid] = None
                continue
            out[tid] = tok.replace("▁", " ")
        else:
            try:
                bts = bytes(byte_decoder[ch] for ch in tok)
                out[tid] = bts.decode("utf-8")
            except (KeyError, UnicodeDecodeError):
                out[tid] = None
    return out


class TokenFSM:
    """Token-level DFA view for one constraint pattern.

    ``next_row(state)`` -> ([V] int32 next-state row, [V] bool mask row);
    rows are computed on first visit and cached. State 0 is initial.
    """

    def __init__(self, pattern: str, dfa: DFA,
                 vocab: List[Optional[str]], eos_token_id: int):
        self.pattern = pattern
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        self.vocab_size = len(vocab)
        self.num_states = dfa.num_states
        self.accepts = dfa.accepts

        max_len = max((len(t) for t in vocab if t), default=1)
        cps = np.full((self.vocab_size, max_len), -1, np.int64)
        for tid, t in enumerate(vocab):
            if not t:
                continue
            cps[tid, :len(t)] = [ord(ch) for ch in t]
        # per-char class id: >=0 real, -1 dead char, -2 padding
        cls = np.where(cps >= 0, dfa.class_of(np.maximum(cps, 0)), -2)
        cls = np.where((cps >= 0) & (cls < 0), -1, cls)
        self._cls = cls.astype(np.int32)
        self._invalid = np.asarray(
            [t is None or t == "" for t in vocab], np.bool_)
        # padded char table: row 0 = dead state, col 0 = dead class
        s, c = dfa.char_table.shape
        self._table = np.full((s + 1, c + 1), -1, np.int32)
        self._table[1:, 1:] = dfa.char_table
        self._rows: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._lock = threading.Lock()

    # FSMs are shared, internally-cached, and logically immutable: when a
    # SamplingParams carrying one is cloned/deepcopied by the engine, the
    # copy must reference the SAME fsm (also: the row cache holds a lock).
    def __copy__(self):
        return self

    def __deepcopy__(self, memo):
        return self

    def next_row(self, state: int) -> Tuple[np.ndarray, np.ndarray]:
        with self._lock:
            row = self._rows.get(state)
        if row is not None:
            return row
        states = np.full((self.vocab_size, ), state, np.int32)
        for i in range(self._cls.shape[1]):
            c = self._cls[:, i]
            nxt = self._table[states + 1, np.maximum(c, -1) + 1]
            states = np.where(c == -2, states, nxt)
        states[self._invalid] = -1
        mask = states >= 0
        mask[self.eos_token_id] = bool(self.accepts[state])
        if not mask.any():
            # live non-accepting state with no continuation: terminating
            # is the only sound recovery
            mask[self.eos_token_id] = True
        out = (states, mask)
        with self._lock:
            self._rows[state] = out
        return out

    def next_state(self, state: int, token_id: int) -> int:
        if state < 0:
            return -1
        if token_id == self.eos_token_id:
            return state
        return int(self.next_row(state)[0][token_id])

    def walk(self, token_ids) -> int:
        """Initial state -> state after emitting ``token_ids``."""
        state = 0
        for tid in token_ids:
            state = self.next_state(state, int(tid))
            if state < 0:
                return -1
        return state

    def allowed(self, state: int) -> np.ndarray:
        if state < 0:
            # constraint already violated (shouldn't happen when masks
            # are enforced); allow only EOS so the request terminates
            row = np.zeros((self.vocab_size, ), np.bool_)
            row[self.eos_token_id] = True
            return row
        return self.next_row(state)[1]


_FSM_CACHE: Dict[Tuple[str, str], TokenFSM] = {}
_CACHE_LOCK = threading.Lock()


def get_token_fsm(pattern: str, tokenizer: Any) -> TokenFSM:
    # accept a TokenizerGroup (engine-facing wrapper) transparently
    if hasattr(tokenizer, "tokenizer") and not hasattr(
            tokenizer, "get_vocab"):
        tokenizer = tokenizer.tokenizer
    key = (pattern,
           f"{getattr(tokenizer, 'name_or_path', '')}:{len(tokenizer)}")
    with _CACHE_LOCK:
        cached = _FSM_CACHE.get(key)
    if cached is not None:
        return cached
    dfa = compile_regex(pattern)
    vocab = _decode_vocab(tokenizer)
    eos = tokenizer.eos_token_id
    if eos is None:
        raise ValueError("guided decoding requires an eos_token_id")
    fsm = TokenFSM(pattern, dfa, vocab, eos)
    logger.info("compiled guided FSM: %d char-DFA states, vocab %d",
                dfa.num_states, fsm.vocab_size)
    with _CACHE_LOCK:
        _FSM_CACHE[key] = fsm
    return fsm
