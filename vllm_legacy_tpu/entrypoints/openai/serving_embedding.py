"""/v1/embeddings implementation (reference: vllm/entrypoints/openai/
serving_embedding.py OpenAIServingEmbedding :34, 144 LoC)."""
from __future__ import annotations

import time
from typing import AsyncIterator, List, Optional

from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    EmbeddingRequest, EmbeddingResponse, EmbeddingResponseData, UsageInfo)
from vllm_legacy_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_legacy_tpu.inputs import parse_and_batch_prompt
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import EmbeddingRequestOutput
from vllm_legacy_tpu.pooling_params import PoolingParams
from vllm_legacy_tpu.utils import merge_async_iterators, random_uuid

logger = init_logger(__name__)


class OpenAIServingEmbedding(OpenAIServing):

    async def create_embedding(self, request: EmbeddingRequest,
                               raw_request=None):
        """Returns EmbeddingResponse or ErrorResponse."""
        error = await self._check_model(request)
        if error is not None:
            return error
        if request.encoding_format == "base64":
            return self.create_error_response(
                "base64 encoding is not currently supported")
        if request.dimensions is not None:
            return self.create_error_response(
                "dimensions is currently not supported")

        request_id = f"embd-{random_uuid()}"
        created_time = int(time.time())
        model_name = self.served_model_names[0]

        try:
            pooling_params = PoolingParams()
            prompts = parse_and_batch_prompt(request.input)
            generators: List[AsyncIterator[EmbeddingRequestOutput]] = []
            for i, prompt_item in enumerate(prompts):
                if "prompt_token_ids" in prompt_item:
                    ids, text = self._validate_prompt_and_tokenize(
                        request,
                        prompt_ids=prompt_item["prompt_token_ids"])
                else:
                    ids, text = self._validate_prompt_and_tokenize(
                        request, prompt=prompt_item["prompt"])
                generators.append(
                    self.engine.encode(
                        {"prompt": text, "prompt_token_ids": ids},
                        pooling_params, f"{request_id}-{i}"))
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = merge_async_iterators(*generators)

        final_res_batch: List[Optional[EmbeddingRequestOutput]] = \
            [None] * len(prompts)
        try:
            async for i, res in result_generator:
                final_res_batch[i] = res
        except ValueError as e:
            return self.create_error_response(str(e))

        data = []
        num_prompt_tokens = 0
        for idx, res in enumerate(final_res_batch):
            data.append(
                EmbeddingResponseData(index=idx,
                                      embedding=res.outputs.embedding))
            num_prompt_tokens += len(res.prompt_token_ids or [])
        return EmbeddingResponse(
            id=request_id,
            created=created_time,
            model=model_name,
            data=data,
            usage=UsageInfo(prompt_tokens=num_prompt_tokens,
                            total_tokens=num_prompt_tokens,
                            completion_tokens=0),
        )
