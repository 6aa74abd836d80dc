"""Minimal /generate JSON server (reference: vllm/entrypoints/
api_server.py, demo endpoint)."""
from __future__ import annotations

import argparse
import asyncio
import json
from typing import AsyncGenerator, Optional

from aiohttp import web

from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.utils import random_uuid

engine: Optional[AsyncLLMEngine] = None


async def health(request: web.Request) -> web.Response:
    return web.Response(status=200)


async def generate(request: web.Request) -> web.Response:
    """POST {prompt, stream, **sampling}; returns {"text": [...]}"""
    request_dict = await request.json()
    prompt = request_dict.pop("prompt")
    stream = request_dict.pop("stream", False)
    sampling_params = SamplingParams(**request_dict)
    request_id = random_uuid()

    results_generator = engine.generate({"prompt": prompt},
                                        sampling_params, request_id)

    if stream:
        resp = web.StreamResponse()
        await resp.prepare(request)
        async for request_output in results_generator:
            text_outputs = [
                request_output.prompt + output.text
                for output in request_output.outputs
            ]
            await resp.write(
                (json.dumps({"text": text_outputs}) + "\0").encode())
        await resp.write_eof()
        return resp

    final_output = None
    async for request_output in results_generator:
        final_output = request_output
    assert final_output is not None
    text_outputs = [
        (final_output.prompt or "") + output.text
        for output in final_output.outputs
    ]
    return web.json_response({"text": text_outputs})


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    global engine
    engine = AsyncLLMEngine.from_engine_args(
        AsyncEngineArgs.from_cli_args(args))

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_post("/generate", generate)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
