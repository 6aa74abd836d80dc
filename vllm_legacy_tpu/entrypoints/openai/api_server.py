"""OpenAI-compatible HTTP server.

Reference: ``vllm/entrypoints/openai/api_server.py`` (FastAPI app:
/v1/completions, /v1/chat/completions, /v1/models, /health, /metrics,
/version; fork adds /dev/metrics/runner :88-99 and /dev/debug/envs
:101-117; API-key middleware :185-197). Built on aiohttp — the only
async HTTP stack in the TPU image — with the same routes and SSE wire
format, so OpenAI SDK clients work unchanged.
"""
from __future__ import annotations

import argparse
import asyncio
import json
from typing import AsyncGenerator, Optional

from aiohttp import web

from vllm_legacy_tpu import __version__, envs
from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_legacy_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_legacy_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, EmbeddingRequest,
    ErrorResponse)
from vllm_legacy_tpu.entrypoints.openai.serving_chat import (
    OpenAIServingChat)
from vllm_legacy_tpu.entrypoints.openai.serving_embedding import (
    OpenAIServingEmbedding)
from vllm_legacy_tpu.entrypoints.openai.serving_completion import (
    OpenAIServingCompletion)
from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

openai_serving_chat: Optional[OpenAIServingChat] = None
openai_serving_completion: Optional[OpenAIServingCompletion] = None
openai_serving_embedding: Optional[OpenAIServingEmbedding] = None
engine: Optional[AsyncLLMEngine] = None


def _json_error(err: ErrorResponse) -> web.Response:
    return web.json_response(err.model_dump(), status=err.code)


async def health(request: web.Request) -> web.Response:
    """Health check (reference: api_server.py:83)."""
    await engine.check_health()
    return web.Response(status=200)


async def show_version(request: web.Request) -> web.Response:
    return web.json_response({"version": __version__})


async def show_available_models(request: web.Request) -> web.Response:
    models = await openai_serving_completion.show_available_models()
    return web.json_response(models.model_dump())


async def metrics(request: web.Request) -> web.Response:
    """Prometheus exposition (reference: ASGI mount :70-74)."""
    from prometheus_client import CONTENT_TYPE_LATEST, generate_latest
    return web.Response(body=generate_latest(),
                        content_type=CONTENT_TYPE_LATEST.split(";")[0])


async def debug_envs(request: web.Request) -> web.Response:
    """Fork-parity debug endpoint (/dev/debug/envs :101-117)."""
    return web.json_response(
        {name: str(getattr(envs, name)) for name in dir(envs)})


async def runner_metrics(request: web.Request) -> web.Response:
    """Fork-parity per-step runner timing (/dev/metrics/runner :88-99):
    rolling prepare/dispatch/fetch averages past a 10-step warmup."""
    try:
        runner = engine.engine.model_executor.worker.model_runner
        return web.json_response(dict(runner.runner_metrics))
    except AttributeError:
        return web.json_response({}, status=503)


async def _sse_response(request: web.Request,
                        gen: AsyncGenerator[str, None]) -> web.Response:
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
    })
    await resp.prepare(request)
    async for chunk in gen:
        await resp.write(chunk.encode())
    await resp.write_eof()
    return resp


async def create_completion(request: web.Request) -> web.Response:
    try:
        body = CompletionRequest(**await request.json())
    except Exception as e:
        return _json_error(
            openai_serving_completion.create_error_response(str(e)))
    generator = await openai_serving_completion.create_completion(
        body, request)
    if isinstance(generator, ErrorResponse):
        return _json_error(generator)
    if body.stream:
        return await _sse_response(request, generator)
    return web.json_response(generator.model_dump())


async def create_chat_completion(request: web.Request) -> web.Response:
    try:
        body = ChatCompletionRequest(**await request.json())
    except Exception as e:
        return _json_error(
            openai_serving_chat.create_error_response(str(e)))
    generator = await openai_serving_chat.create_chat_completion(
        body, request)
    if isinstance(generator, ErrorResponse):
        return _json_error(generator)
    if body.stream:
        return await _sse_response(request, generator)
    return web.json_response(generator.model_dump())


async def create_embedding(request: web.Request) -> web.Response:
    try:
        body = EmbeddingRequest(**await request.json())
    except Exception as e:
        return _json_error(
            openai_serving_embedding.create_error_response(str(e)))
    response = await openai_serving_embedding.create_embedding(
        body, request)
    if isinstance(response, ErrorResponse):
        return _json_error(response)
    return web.json_response(response.model_dump())


@web.middleware
async def api_key_middleware(request: web.Request, handler):
    token = envs.VLT_API_KEY
    if token and not request.path.startswith(("/health", "/metrics")):
        auth = request.headers.get("Authorization")
        if auth != f"Bearer {token}":
            return web.json_response({"error": "Unauthorized"},
                                     status=401)
    return await handler(request)


def build_app() -> web.Application:
    app = web.Application(middlewares=[api_key_middleware])
    app.router.add_get("/health", health)
    app.router.add_get("/version", show_version)
    app.router.add_get("/v1/models", show_available_models)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/dev/debug/envs", debug_envs)
    app.router.add_get("/dev/metrics/runner", runner_metrics)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    app.router.add_post("/v1/embeddings", create_embedding)
    return app


async def init_server(args: argparse.Namespace) -> web.Application:
    global engine, openai_serving_chat, openai_serving_completion
    global openai_serving_embedding
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served_model_names = [args.served_model_name or args.model]
    openai_serving_completion = OpenAIServingCompletion(
        engine, served_model_names)
    openai_serving_chat = OpenAIServingChat(
        engine, served_model_names,
        response_role=args.response_role,
        chat_template=args.chat_template)
    openai_serving_embedding = OpenAIServingEmbedding(
        engine, served_model_names)
    await openai_serving_completion._post_init()
    await openai_serving_chat._post_init()
    await openai_serving_embedding._post_init()
    return build_app()


def make_arg_parser(
        parser: Optional[argparse.ArgumentParser] = None
) -> argparse.ArgumentParser:
    if parser is None:
        parser = argparse.ArgumentParser(
            description="vllm-legacy-tpu OpenAI-compatible server")
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--response-role", type=str, default="assistant")
    parser.add_argument("--chat-template", type=str, default=None)
    parser = AsyncEngineArgs.add_cli_args(parser)
    return parser


def main() -> None:
    args = make_arg_parser().parse_args()
    loop = asyncio.new_event_loop()
    app = loop.run_until_complete(init_server(args))
    logger.info("Starting server on %s:%d", args.host or "0.0.0.0",
                args.port)
    web.run_app(app, host=args.host, port=args.port, loop=loop)


if __name__ == "__main__":
    main()
