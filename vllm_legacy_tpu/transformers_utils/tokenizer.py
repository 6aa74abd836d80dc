"""Tokenizer acquisition + convenience wrappers (reference:
vllm/transformers_utils/tokenizer.py + tokenizer_group/)."""
from __future__ import annotations

from typing import List, Optional, Union

from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.utils import LRUCache

logger = init_logger(__name__)


def get_tokenizer(
    tokenizer_name: str,
    *,
    tokenizer_mode: str = "auto",
    trust_remote_code: bool = False,
    revision: Optional[str] = None,
    **kwargs,
):
    from transformers import AutoTokenizer
    if tokenizer_mode == "slow":
        kwargs["use_fast"] = False
    tokenizer = AutoTokenizer.from_pretrained(
        tokenizer_name,
        trust_remote_code=trust_remote_code,
        revision=revision,
        **kwargs)
    if not getattr(tokenizer, "is_fast", True):
        logger.warning(
            "Using a slow tokenizer; consider a fast one for "
            "better detokenization throughput.")
    return tokenizer


class TokenizerGroup:
    """In-process tokenizer group (reference:
    tokenizer_group/tokenizer_group.py:94 + ray_tokenizer_group.py:169).

    The capability the reference gets from its Ray actor pool —
    tokenization off the engine loop under heavy chat traffic — comes
    from a thread pool here: HF fast tokenizers run in Rust and release
    the GIL, so ``encode_async`` offloads to ``tokenizer_pool_size``
    executor threads and the asyncio engine loop keeps stepping the
    device while prompts tokenize. ``tokenizer_pool_size=0`` (default)
    keeps the synchronous in-loop behavior."""

    def __init__(self, tokenizer_id: str, *, enable_lora: bool = False,
                 max_num_seqs: Optional[int] = None,
                 max_input_length: Optional[int] = None,
                 tokenizer_pool_size: int = 0, **kwargs) -> None:
        self.tokenizer_id = tokenizer_id
        self.max_input_length = max_input_length
        self.enable_lora = enable_lora
        self.tokenizer = get_tokenizer(tokenizer_id, **kwargs)
        self._lora_tokenizers = LRUCache(capacity=max(max_num_seqs or 0,
                                                      32))
        self._pool = None
        if tokenizer_pool_size > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=tokenizer_pool_size,
                thread_name_prefix="tokenizer")

    def ping(self) -> bool:
        return True

    def get_max_input_len(self, lora_request=None) -> Optional[int]:
        return self.max_input_length

    def encode(self, prompt: str, request_id: Optional[str] = None,
               lora_request=None) -> List[int]:
        tokenizer = self.get_lora_tokenizer(lora_request)
        return tokenizer.encode(prompt)

    async def encode_async(self, prompt: str,
                           request_id: Optional[str] = None,
                           lora_request=None) -> List[int]:
        if self._pool is None:
            return self.encode(prompt, request_id, lora_request)
        import asyncio
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            self._pool, self.encode, prompt, request_id, lora_request)

    def get_lora_tokenizer(self, lora_request=None):
        if lora_request is None or not self.enable_lora:
            return self.tokenizer
        key = lora_request.lora_int_id
        cached = self._lora_tokenizers.get(key)
        if cached is not None:
            return cached
        try:
            tok = get_tokenizer(lora_request.lora_local_path
                                or lora_request.lora_name)
        except Exception:
            tok = self.tokenizer
        self._lora_tokenizers.put(key, tok)
        return tok
