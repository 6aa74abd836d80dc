"""/v1/chat/completions implementation (reference: vllm/entrypoints/
openai/serving_chat.py, 623 LoC — chat templates, streaming SSE)."""
from __future__ import annotations

import time
from typing import AsyncGenerator, Dict, List, Optional, Union

from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionResponseChoice, ChatCompletionResponseStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, DeltaMessage,
    ErrorResponse, UsageInfo)
from vllm_legacy_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import RequestOutput
from vllm_legacy_tpu.utils import random_uuid

logger = init_logger(__name__)


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine: AsyncLLMEngine,
                 served_model_names: List[str],
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None,
                 **kwargs) -> None:
        super().__init__(engine, served_model_names, **kwargs)
        self.response_role = response_role
        self.chat_template = chat_template

    def _load_chat_template(self) -> None:
        if self.chat_template and self.tokenizer is not None:
            import codecs
            import os
            if os.path.isfile(self.chat_template):
                with open(self.chat_template) as f:
                    self.tokenizer.chat_template = f.read()
            else:
                self.tokenizer.chat_template = codecs.decode(
                    self.chat_template, "unicode_escape")

    async def _post_init(self):
        await super()._post_init()
        self._load_chat_template()

    def _apply_chat_template(self,
                             request: ChatCompletionRequest) -> str:
        messages = [m.model_dump() for m in request.messages]
        template = request.chat_template or getattr(
            self.tokenizer, "chat_template", None)
        if template is None:
            # basic fallback template
            parts = [f"{m['role']}: {m['content']}" for m in messages]
            parts.append(f"{self.response_role}:")
            return "\n".join(parts)
        return self.tokenizer.apply_chat_template(
            conversation=messages,
            tokenize=False,
            chat_template=request.chat_template,
            add_generation_prompt=bool(request.add_generation_prompt))

    async def create_chat_completion(self,
                                     request: ChatCompletionRequest,
                                     raw_request=None):
        error = await self._check_model(request)
        if error is not None:
            return error
        try:
            prompt = self._apply_chat_template(request)
            sampling_params = request.to_sampling_params()
            await self._maybe_set_guided_fsm(request, sampling_params)
            prompt_ids, prompt_text = self._validate_prompt_and_tokenize(
                request, prompt=prompt)
        except ValueError as e:
            return self.create_error_response(str(e))

        request_id = f"chatcmpl-{random_uuid()}"
        created_time = int(time.time())
        model_name = self.served_model_names[0]
        result_generator = self.engine.generate(
            {"prompt": prompt_text, "prompt_token_ids": prompt_ids},
            sampling_params, request_id)

        if request.stream:
            return self._chat_stream_generator(request, result_generator,
                                               request_id, created_time,
                                               model_name)

        final_res: Optional[RequestOutput] = None
        async for res in result_generator:
            final_res = res
        assert final_res is not None

        choices: List[ChatCompletionResponseChoice] = []
        for output in final_res.outputs:
            logprobs = None
            if request.logprobs:
                logprobs = self._create_logprobs(
                    output.token_ids, output.logprobs or [],
                    request.top_logprobs)
            choices.append(
                ChatCompletionResponseChoice(
                    index=output.index,
                    message=ChatMessage(role=self.response_role,
                                        content=output.text),
                    logprobs=logprobs,
                    finish_reason=output.finish_reason,
                    stop_reason=output.stop_reason))
        num_prompt = len(final_res.prompt_token_ids)
        num_gen = sum(len(o.token_ids) for o in final_res.outputs)
        usage = UsageInfo(prompt_tokens=num_prompt,
                          completion_tokens=num_gen,
                          total_tokens=num_prompt + num_gen)
        return ChatCompletionResponse(id=request_id, created=created_time,
                                      model=model_name, choices=choices,
                                      usage=usage)

    async def _chat_stream_generator(
            self, request, result_generator, request_id, created_time,
            model_name) -> AsyncGenerator[str, None]:
        first = True
        previous_texts: Dict[int, str] = {}
        previous_num_tokens: Dict[int, int] = {}
        try:
            async for res in result_generator:
                if first:
                    for i in range(request.n):
                        chunk = ChatCompletionStreamResponse(
                            id=request_id,
                            created=created_time,
                            model=model_name,
                            choices=[
                                ChatCompletionResponseStreamChoice(
                                    index=i,
                                    delta=DeltaMessage(
                                        role=self.response_role),
                                    finish_reason=None)
                            ])
                        yield f"data: {chunk.model_dump_json()}\n\n"
                    first = False
                for output in res.outputs:
                    i = output.index
                    prev_text = previous_texts.get(i, "")
                    delta_text = output.text[len(prev_text):]
                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    if not delta_text and output.finish_reason is None:
                        continue
                    chunk = ChatCompletionStreamResponse(
                        id=request_id,
                        created=created_time,
                        model=model_name,
                        choices=[
                            ChatCompletionResponseStreamChoice(
                                index=i,
                                delta=DeltaMessage(content=delta_text),
                                finish_reason=output.finish_reason,
                                stop_reason=output.stop_reason)
                        ])
                    yield f"data: {chunk.model_dump_json()}\n\n"
        except ValueError as e:
            yield (f"data: "
                   f"{self.create_streaming_error_response(str(e))}\n\n")
        yield "data: [DONE]\n\n"
