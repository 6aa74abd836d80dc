"""OpenAI-compatible batch runner (reference: vllm/entrypoints/openai/
run_batch.py, 141 LoC): one JSONL line per request (BatchRequestInput,
/v1/chat/completions bodies), all submitted to the engine concurrently,
one BatchRequestOutput JSONL line each.

Usage:
  python -m vllm_legacy_tpu.entrypoints.openai.run_batch \
      -i requests.jsonl -o results.jsonl --model <model>
"""
from __future__ import annotations

import argparse
import asyncio
from io import StringIO

from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    BatchRequestInput, BatchRequestOutput, ChatCompletionResponse)
from vllm_legacy_tpu.entrypoints.openai.serving_chat import (
    OpenAIServingChat)
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.utils import random_uuid

logger = init_logger(__name__)


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="OpenAI-compatible batch runner.")
    parser.add_argument("-i", "--input-file", required=True,
                        help="path to the JSONL batch input file")
    parser.add_argument("-o", "--output-file", required=True,
                        help="path for the JSONL batch output file")
    parser.add_argument("--response-role", default="assistant")
    parser.add_argument("--served-model-name", default=None)
    parser.add_argument("--chat-template", default=None)
    return AsyncEngineArgs.add_cli_args(parser)


async def run_request(chat_serving: OpenAIServingChat,
                      request: BatchRequestInput) -> BatchRequestOutput:
    response = await chat_serving.create_chat_completion(request.body)
    if isinstance(response, ChatCompletionResponse):
        return BatchRequestOutput(id=f"vlt-{random_uuid()}",
                                  custom_id=request.custom_id,
                                  response=response, error=None)
    return BatchRequestOutput(id=f"vlt-{random_uuid()}",
                              custom_id=request.custom_id,
                              response=None,
                              error=getattr(response, "message",
                                            str(response)))


async def run_batch(args) -> None:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served_model_names = [args.served_model_name or args.model]
    chat_serving = OpenAIServingChat(engine, served_model_names,
                                     response_role=args.response_role,
                                     chat_template=args.chat_template)
    await chat_serving._post_init()

    with open(args.input_file) as f:
        lines = [ln for ln in f.read().strip().split("\n") if ln]
    futures = []
    for line in lines:
        request = BatchRequestInput.model_validate_json(line)
        if request.url.rstrip("/") != "/v1/chat/completions":
            raise ValueError(
                f"unsupported batch url {request.url!r}; only "
                "/v1/chat/completions is supported")
        futures.append(run_request(chat_serving, request))
    responses = await asyncio.gather(*futures)

    buf = StringIO()
    for response in responses:
        print(response.model_dump_json(), file=buf)
    with open(args.output_file, "w") as f:
        f.write(buf.getvalue().strip() + "\n")
    logger.info("wrote %d batch results to %s", len(responses),
                args.output_file)


def main() -> None:
    args = make_arg_parser().parse_args()
    asyncio.run(run_batch(args))


if __name__ == "__main__":
    main()
