"""/v1/completions implementation (reference: vllm/entrypoints/openai/
serving_completion.py, 415 LoC)."""
from __future__ import annotations

import time
from typing import AsyncGenerator, AsyncIterator, Dict, List, Optional

from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse,
    ErrorResponse, UsageInfo)
from vllm_legacy_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_legacy_tpu.inputs import parse_and_batch_prompt
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import RequestOutput
from vllm_legacy_tpu.utils import merge_async_iterators, random_uuid

logger = init_logger(__name__)


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(self, request: CompletionRequest,
                                raw_request=None):
        """Returns CompletionResponse, an SSE async generator, or
        ErrorResponse."""
        error = await self._check_model(request)
        if error is not None:
            return error
        if request.suffix is not None:
            return self.create_error_response(
                "suffix is not currently supported")
        if request.echo and request.stream:
            return self.create_error_response(
                "echo is not supported with streaming")

        request_id = f"cmpl-{random_uuid()}"
        created_time = int(time.time())
        model_name = self.served_model_names[0]

        try:
            sampling_params = request.to_sampling_params()
            if request.echo and request.logprobs is not None:
                # echo + logprobs returns the prompt's own logprobs too
                # (reference: serving_completion echo handling)
                sampling_params.prompt_logprobs = request.logprobs
            await self._maybe_set_guided_fsm(request, sampling_params)
            prompts = parse_and_batch_prompt(request.prompt)
            generators: List[AsyncIterator[RequestOutput]] = []
            prompt_text_by_idx: Dict[int, str] = {}
            for i, prompt_item in enumerate(prompts):
                if "prompt_token_ids" in prompt_item:
                    ids, text = self._validate_prompt_and_tokenize(
                        request,
                        prompt_ids=prompt_item["prompt_token_ids"])
                else:
                    ids, text = self._validate_prompt_and_tokenize(
                        request, prompt=prompt_item["prompt"])
                prompt_text_by_idx[i] = text
                generators.append(
                    self.engine.generate(
                        {"prompt": text, "prompt_token_ids": ids},
                        sampling_params, f"{request_id}-{i}"))
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = merge_async_iterators(*generators)

        if request.stream:
            return self._completion_stream_generator(
                request, result_generator, request_id, created_time,
                model_name, len(prompts))

        final_res_batch: List[Optional[RequestOutput]] = [None] * len(
            prompts)
        try:
            async for i, res in result_generator:
                final_res_batch[i] = res
        except ValueError as e:
            return self.create_error_response(str(e))
        return self._request_to_response(request, final_res_batch,
                                         request_id, created_time,
                                         model_name)

    def _request_to_response(self, request, final_res_batch, request_id,
                             created_time, model_name):
        choices: List[CompletionResponseChoice] = []
        num_prompt_tokens = 0
        num_generated_tokens = 0
        for prompt_idx, final_res in enumerate(final_res_batch):
            assert final_res is not None
            num_prompt_tokens += len(final_res.prompt_token_ids)
            for output in final_res.outputs:
                logprobs = None
                token_ids = list(output.token_ids)
                lp_dicts = list(output.logprobs or [])
                text = output.text
                if request.echo:
                    text = (final_res.prompt or "") + text
                    token_ids = list(final_res.prompt_token_ids) + \
                        token_ids
                    lp_dicts = list(final_res.prompt_logprobs or
                                    [None] *
                                    len(final_res.prompt_token_ids)) + \
                        lp_dicts
                if request.logprobs is not None:
                    logprobs = self._create_logprobs(
                        token_ids, lp_dicts, request.logprobs)
                choices.append(
                    CompletionResponseChoice(
                        index=prompt_idx * request.n + output.index,
                        text=text,
                        logprobs=logprobs,
                        finish_reason=output.finish_reason,
                        stop_reason=output.stop_reason))
                num_generated_tokens += len(output.token_ids)
        usage = UsageInfo(prompt_tokens=num_prompt_tokens,
                          completion_tokens=num_generated_tokens,
                          total_tokens=num_prompt_tokens +
                          num_generated_tokens)
        return CompletionResponse(id=request_id, created=created_time,
                                  model=model_name, choices=choices,
                                  usage=usage)

    async def _completion_stream_generator(
            self, request, result_generator, request_id, created_time,
            model_name, num_prompts) -> AsyncGenerator[str, None]:
        previous_texts: Dict[int, str] = {}
        previous_num_tokens: Dict[int, int] = {}
        try:
            async for prompt_idx, res in result_generator:
                for output in res.outputs:
                    i = prompt_idx * request.n + output.index
                    prev_text = previous_texts.get(i, "")
                    prev_ntok = previous_num_tokens.get(i, 0)
                    delta_text = output.text[len(prev_text):]
                    delta_ids = output.token_ids[prev_ntok:]
                    logprobs = None
                    if request.logprobs is not None:
                        logprobs = self._create_logprobs(
                            delta_ids,
                            (output.logprobs or [])[prev_ntok:],
                            request.logprobs,
                            initial_text_offset=len(prev_text))
                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    chunk = CompletionStreamResponse(
                        id=request_id,
                        created=created_time,
                        model=model_name,
                        choices=[
                            CompletionResponseStreamChoice(
                                index=i,
                                text=delta_text,
                                logprobs=logprobs,
                                finish_reason=output.finish_reason,
                                stop_reason=output.stop_reason)
                        ])
                    yield f"data: {chunk.model_dump_json()}\n\n"
        except ValueError as e:
            yield (f"data: "
                   f"{self.create_streaming_error_response(str(e))}\n\n")
        yield "data: [DONE]\n\n"
