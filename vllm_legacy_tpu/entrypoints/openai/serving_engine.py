"""Shared serving logic (reference: vllm/entrypoints/openai/
serving_engine.py OpenAIServing base)."""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ErrorResponse, LogProbs,
    ModelCard, ModelList, ModelPermission)
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import Logprob

logger = init_logger(__name__)


@dataclass
class LoRAModulePath:
    name: str
    local_path: str


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model_names:
                 List[str],
                 lora_modules: Optional[List[LoRAModulePath]] = None
                 ) -> None:
        self.engine = engine
        self.served_model_names = served_model_names
        self.max_model_len = 0
        self.tokenizer = None
        self.lora_requests: List = []
        decoding = getattr(engine.engine.engine_config,
                           "decoding_config", None)
        self.default_guided_backend = (
            decoding.guided_decoding_backend if decoding else "outlines")

    async def _post_init(self):
        model_config = await self.engine.get_model_config()
        self.max_model_len = model_config.max_model_len
        self.tokenizer = self.engine.get_tokenizer()

    async def show_available_models(self) -> ModelList:
        cards = [
            ModelCard(id=name,
                      max_model_len=self.max_model_len,
                      root=self.served_model_names[0],
                      permission=[ModelPermission()])
            for name in self.served_model_names
        ]
        return ModelList(data=cards)

    def create_error_response(
            self,
            message: str,
            err_type: str = "BadRequestError",
            status_code: int = 400) -> ErrorResponse:
        return ErrorResponse(message=message, type=err_type,
                             code=status_code)

    def create_streaming_error_response(
            self,
            message: str,
            err_type: str = "BadRequestError",
            status_code: int = 400) -> str:
        return json.dumps({
            "error":
            self.create_error_response(message, err_type,
                                       status_code).model_dump()
        })

    async def _maybe_set_guided_fsm(self, request, sampling_params) -> None:
        """Attach a guided-decoding TokenFSM for the request's guided_*
        fields / response_format (reference: serving layer calling
        get_guided_decoding_logits_processor). FSM compilation can take
        seconds for big schemas, so it runs off the event loop; results
        are cached per (pattern, tokenizer)."""
        import asyncio

        from vllm_legacy_tpu.guided_decoding import get_guided_fsm
        rf = getattr(request, "response_format", None)
        json_object = bool(rf and rf.get("type") == "json_object")
        if not (request.guided_json or request.guided_regex
                or request.guided_choice or request.guided_grammar
                or json_object):
            return
        backend = (getattr(request, "guided_decoding_backend", None)
                   or self.default_guided_backend)
        fsm = await asyncio.to_thread(
            get_guided_fsm,
            self.tokenizer,
            guided_regex=request.guided_regex,
            guided_json=request.guided_json,
            guided_choice=request.guided_choice,
            guided_grammar=request.guided_grammar,
            json_object=json_object,
            backend=backend,
            whitespace_pattern=getattr(request,
                                       "guided_whitespace_pattern", None),
        )
        sampling_params.guided_fsm = fsm

    async def _check_model(self, request) -> Optional[ErrorResponse]:
        if request.model in self.served_model_names:
            return None
        return self.create_error_response(
            message=f"The model `{request.model}` does not exist.",
            err_type="NotFoundError",
            status_code=404)

    def _validate_prompt_and_tokenize(
        self,
        request: Union[ChatCompletionRequest, CompletionRequest],
        prompt: Optional[str] = None,
        prompt_ids: Optional[List[int]] = None,
        truncate_prompt_tokens: Optional[int] = None,
    ) -> Tuple[List[int], str]:
        if prompt_ids is None:
            input_ids = self.tokenizer.encode(prompt)
        else:
            input_ids = list(prompt_ids)
            if prompt is None:
                prompt = (self.tokenizer.decode(input_ids)
                          if self.tokenizer is not None else "")
        if truncate_prompt_tokens is not None:
            input_ids = input_ids[-truncate_prompt_tokens:]

        token_num = len(input_ids)
        max_tokens = getattr(request, "max_tokens", None)
        has_max_tokens = "max_tokens" in type(request).model_fields
        if max_tokens is None and has_max_tokens:
            request.max_tokens = self.max_model_len - token_num
            max_tokens = request.max_tokens
        if not has_max_tokens and token_num > self.max_model_len:
            raise ValueError(
                f"Prompt length {token_num} exceeds maximum context "
                f"length {self.max_model_len}")
        if has_max_tokens and \
                token_num + (request.max_tokens or 0) > self.max_model_len:
            raise ValueError(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens. However, you requested "
                f"{(request.max_tokens or 0) + token_num} tokens "
                f"({token_num} in the messages, {request.max_tokens} in "
                f"the completion).")
        return input_ids, prompt if prompt is not None else ""

    def _create_logprobs(
        self,
        token_ids: List[int],
        top_logprobs: List[Optional[Dict[int, Logprob]]],
        num_output_top_logprobs: Optional[int] = None,
        initial_text_offset: int = 0,
    ) -> LogProbs:
        """Token-level logprob payload (reference: serving_engine.py
        _create_logprobs)."""
        logprobs = LogProbs()
        last_token_len = 0
        if num_output_top_logprobs:
            logprobs.top_logprobs = []
        for i, token_id in enumerate(token_ids):
            step_top_logprobs = top_logprobs[i] if i < len(
                top_logprobs) else None
            if step_top_logprobs is None:
                token = self.tokenizer.decode(token_id)
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(None)
                if num_output_top_logprobs:
                    logprobs.top_logprobs.append(None)
            else:
                entry = step_top_logprobs.get(token_id)
                token = (entry.decoded_token
                         if entry and entry.decoded_token is not None
                         else self.tokenizer.decode(token_id))
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(
                    entry.logprob if entry else None)
                if num_output_top_logprobs:
                    logprobs.top_logprobs.append({
                        (lp.decoded_token if lp.decoded_token is not None
                         else self.tokenizer.decode(tid)): lp.logprob
                        for tid, lp in step_top_logprobs.items()
                    })
            if len(logprobs.text_offset) == 0:
                logprobs.text_offset.append(initial_text_offset)
            else:
                logprobs.text_offset.append(logprobs.text_offset[-1] +
                                            last_token_len)
            last_token_len = len(token)
        return logprobs
