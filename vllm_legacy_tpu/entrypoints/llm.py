"""Offline batched inference API (reference: vllm/entrypoints/llm.py
LLM :24, generate :159-303, _run_engine :536)."""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

from vllm_legacy_tpu.engine.arg_utils import EngineArgs
from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.inputs import (PromptInputs, PromptStrictInputs,
                                    parse_and_batch_prompt)
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import RequestOutput
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.utils import Counter

logger = init_logger(__name__)


class LLM:
    """User-facing offline engine wrapper."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        skip_tokenizer_init: bool = False,
        trust_remote_code: bool = False,
        tensor_parallel_size: int = 1,
        dtype: str = "auto",
        quantization: Optional[str] = None,
        revision: Optional[str] = None,
        seed: int = 0,
        hbm_utilization: float = 0.9,
        swap_space: float = 4.0,
        max_model_len: Optional[int] = None,
        enable_prefix_caching: bool = False,
        enable_chunked_prefill: bool = False,
        max_num_seqs: int = 256,
        max_num_batched_tokens: Optional[int] = None,
        block_size: int = 16,
        kv_cache_dtype: str = "auto",
        load_format: str = "auto",
        disable_log_stats: bool = True,
        **kwargs,
    ) -> None:
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer,
            tokenizer_mode=tokenizer_mode,
            skip_tokenizer_init=skip_tokenizer_init,
            trust_remote_code=trust_remote_code,
            tensor_parallel_size=tensor_parallel_size,
            dtype=dtype,
            quantization=quantization,
            revision=revision,
            seed=seed,
            hbm_utilization=hbm_utilization,
            swap_space=swap_space,
            max_model_len=max_model_len,
            enable_prefix_caching=enable_prefix_caching,
            enable_chunked_prefill=enable_chunked_prefill,
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            block_size=block_size,
            kv_cache_dtype=kv_cache_dtype,
            load_format=load_format,
            disable_log_stats=disable_log_stats,
            **kwargs,
        )
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.get_tokenizer()

    def generate(
        self,
        prompts: Union[PromptStrictInputs, Sequence[PromptStrictInputs],
                       str, List[str], None] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
        prompt_token_ids: Optional[Union[List[int],
                                         List[List[int]]]] = None,
        use_tqdm: bool = True,
        lora_request=None,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids must be "
                             "provided.")
        if prompt_token_ids is not None:
            inputs = parse_and_batch_prompt(prompt_token_ids)
        else:
            inputs = parse_and_batch_prompt(prompts)

        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, list):
            if len(sampling_params) != len(inputs):
                raise ValueError(
                    "sampling_params list length must match prompts")
            params_list = sampling_params
        else:
            params_list = [sampling_params] * len(inputs)

        for item, params in zip(inputs, params_list):
            self._add_request(item, params, lora_request)
        return self._run_engine(use_tqdm=use_tqdm)

    def save_sharded_state(self, path: str) -> None:
        """Persist the POST-PROCESSED param pytree for fast reload
        (reference: worker.save_sharded_state worker.py:123 +
        examples/save_sharded_state.py). Reload by pointing --model at
        ``path`` (config + tokenizer files are copied alongside)."""
        import os
        import shutil

        from vllm_legacy_tpu.model_loader.sharded_state import save_params
        worker = self.llm_engine.model_executor.worker
        save_params(worker.model_runner.params, path)
        # make the directory a self-contained --model target
        self.llm_engine.model_config.hf_config.save_pretrained(path)
        src = self.llm_engine.model_config.tokenizer
        if src and os.path.isdir(src):
            for name in os.listdir(src):
                if "token" in name or name.endswith(".json") \
                        or name.endswith(".model"):
                    dst = os.path.join(path, name)
                    if not os.path.exists(dst):
                        shutil.copy(os.path.join(src, name), dst)

    def encode(
        self,
        prompts: Union[PromptStrictInputs, Sequence[PromptStrictInputs],
                       str, List[str], None] = None,
        pooling_params=None,
        prompt_token_ids: Optional[Union[List[int],
                                         List[List[int]]]] = None,
        use_tqdm: bool = True,
    ):
        """Embedding-model entrypoint (reference: entrypoints/llm.py
        encode :305-372); returns EmbeddingRequestOutputs."""
        from vllm_legacy_tpu.pooling_params import PoolingParams
        if prompt_token_ids is not None:
            inputs = parse_and_batch_prompt(prompt_token_ids)
        else:
            inputs = parse_and_batch_prompt(prompts)
        if pooling_params is None:
            pooling_params = PoolingParams()
        for item in inputs:
            self._add_request(item, pooling_params)
        return self._run_engine(use_tqdm=use_tqdm)

    def _add_request(self, inputs: PromptInputs,
                     params: SamplingParams,
                     lora_request=None) -> None:
        request_id = str(next(self.request_counter))
        self.llm_engine.add_request(request_id, inputs, params,
                                    lora_request=lora_request)

    def _run_engine(self, *, use_tqdm: bool) -> List[RequestOutput]:
        pbar = None
        if use_tqdm:
            try:
                from tqdm import tqdm
                pbar = tqdm(
                    total=self.llm_engine.get_num_unfinished_requests(),
                    desc="Processed prompts", dynamic_ncols=True)
            except ImportError:
                pbar = None
        outputs: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    outputs.append(output)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        return sorted(outputs, key=lambda x: int(x.request_id))
