"""/v1/embeddings endpoint e2e (reference:
tests/entrypoints/test_openai_server.py embedding cases)."""
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer


@pytest.fixture(scope="module")
def embed_model_path(tmp_path_factory):
    import torch
    from transformers import MistralConfig, MistralModel
    path = tmp_path_factory.mktemp("srv_embed_model")
    cfg = MistralConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=256)
    torch.manual_seed(0)
    MistralModel(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def test_embeddings_endpoint(embed_model_path):
    import asyncio

    from vllm_legacy_tpu.entrypoints.openai import api_server

    async def main():
        parser = api_server.make_arg_parser()
        args = parser.parse_args([
            "--model", embed_model_path, "--dtype", "float32",
            "--max-model-len", "128", "--max-num-seqs", "8",
        ])
        args.num_tpu_blocks_override = 64
        args.skip_tokenizer_init = True
        app = await api_server.init_server(args)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings", json={
                "model": embed_model_path,
                "input": [[7, 9, 11, 13], [100, 101]],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert body["object"] == "list"
            assert len(body["data"]) == 2
            assert body["usage"]["prompt_tokens"] == 6
            e0 = np.asarray(body["data"][0]["embedding"], np.float32)
            e1 = np.asarray(body["data"][1]["embedding"], np.float32)
            assert e0.shape == (64, ) and e1.shape == (64, )
            assert abs(np.linalg.norm(e0) - 1.0) < 1e-3
            assert not np.allclose(e0, e1)

            # same input -> identical embedding (deterministic)
            r = await client.post("/v1/embeddings", json={
                "model": embed_model_path,
                "input": [[7, 9, 11, 13]],
            })
            body2 = await r.json()
            np.testing.assert_allclose(
                np.asarray(body2["data"][0]["embedding"]), e0,
                rtol=1e-5, atol=1e-6)

            # probe: base64 encoding rejected cleanly
            r = await client.post("/v1/embeddings", json={
                "model": embed_model_path,
                "input": [[1, 2]],
                "encoding_format": "base64",
            })
            assert r.status == 400
        finally:
            await client.close()

    asyncio.run(main())
