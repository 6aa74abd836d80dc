"""OpenAI server e2e over the tiny checkpoint (reference:
tests/entrypoints/test_openai_server.py — here with aiohttp's in-process
test client instead of a spawned subprocess; single event loop because
the async engine's background task binds to it)."""
import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tests.e2e.test_greedy_equality import tiny_llama_path  # fixture


def test_openai_server_endpoints(tiny_llama_path):
    from vllm_legacy_tpu.entrypoints.openai import api_server

    async def main():
        parser = api_server.make_arg_parser()
        args = parser.parse_args([
            "--model", tiny_llama_path, "--dtype", "float32",
            "--max-model-len", "128", "--max-num-seqs", "8",
        ])
        args.num_tpu_blocks_override = 64
        app = await api_server.init_server(args)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            # health / models / version / metrics
            r = await client.get("/health")
            assert r.status == 200
            r = await client.get("/v1/models")
            body = await r.json()
            assert body["data"][0]["id"] == tiny_llama_path
            r = await client.get("/version")
            assert "version" in await r.json()
            r = await client.get("/metrics")
            assert r.status == 200
            r = await client.get("/dev/debug/envs")
            assert "VLT_PALLAS_INTERPRET" in await r.json()
            r = await client.get("/dev/metrics/runner")
            rm = await r.json()
            assert {"steps", "prepare_ms", "dispatch_ms"} <= set(rm)

            # completion
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "Hello, my name is",
                "max_tokens": 5,
                "temperature": 0,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert body["object"] == "text_completion"
            assert len(body["choices"]) == 1
            assert body["usage"]["completion_tokens"] <= 5
            assert body["choices"][0]["finish_reason"] in ("length",
                                                           "stop")

            # streaming completion
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "The future of AI is",
                "max_tokens": 5,
                "temperature": 0,
                "stream": True,
            })
            assert r.status == 200
            chunks = []
            async for line in r.content:
                line = line.decode().strip()
                if line.startswith("data: "):
                    payload = line[len("data: "):]
                    if payload == "[DONE]":
                        break
                    chunks.append(json.loads(payload))
            assert chunks, "no SSE chunks received"
            assert chunks[-1]["choices"][0]["finish_reason"] in (
                "length", "stop")

            # chat completion (fallback template; tiny tokenizer has
            # no chat template)
            r = await client.post("/v1/chat/completions", json={
                "model": tiny_llama_path,
                "messages": [{"role": "user", "content": "Hello!"}],
                "max_tokens": 5,
                "temperature": 0,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert body["object"] == "chat.completion"
            assert body["choices"][0]["message"]["role"] == "assistant"

            # guided decoding: choice constraint (token-level; the tiny
            # test tokenizer's decode may insert spaces)
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "Hello",
                "max_tokens": 8,
                "temperature": 1.0,
                "seed": 5,
                "guided_choice": ["thequick", "brownfox"],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            text = body["choices"][0]["text"].replace(" ", "")
            assert text in ("thequick", "brownfox"), text

            # echo + logprobs: prompt tokens come back with logprobs
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "Hello, my name is",
                "max_tokens": 3,
                "temperature": 0,
                "echo": True,
                "logprobs": 2,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            ch = body["choices"][0]
            assert ch["text"].startswith("Hello")
            lp = ch["logprobs"]
            # first prompt token has no logprob; later ones do
            assert lp["token_logprobs"][0] is None
            assert any(v is not None for v in lp["token_logprobs"][1:])
            n_prompt = body["usage"]["prompt_tokens"]
            assert len(lp["tokens"]) == n_prompt + 3

            # guided grammar compiles through the regex pipeline
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "Hello",
                "max_tokens": 8,
                "temperature": 1.0,
                "seed": 3,
                "guided_grammar":
                "root ::= greeting\ngreeting ::= 'the' | 'fox'",
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            text = body["choices"][0]["text"].replace(" ", "")
            assert text in ("the", "fox"), text

            # an invalid grammar is rejected with a clear error
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "x",
                "max_tokens": 2,
                "guided_grammar": "root ::= '(' root ')'",
            })
            assert r.status == 400

            # wrong model -> 404
            r = await client.post("/v1/completions", json={
                "model": "does-not-exist",
                "prompt": "x",
                "max_tokens": 1,
            })
            assert r.status == 404

            # over-long -> 400 with context-length message
            r = await client.post("/v1/completions", json={
                "model": tiny_llama_path,
                "prompt": "x",
                "max_tokens": 100000,
            })
            assert r.status == 400
            body = await r.json()
            assert "maximum context length" in body["message"]
        finally:
            await client.close()

    asyncio.run(main())
