"""OpenAI server LoRA-module serving (reference --lora-modules +
tests/entrypoints/test_openai_server.py LoRA cases): an adapter served
under its own model name must be listed in /v1/models, route requests
through the adapter, and produce different greedy output than the base
model; beam search via the API must also work end-to-end."""
import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

MODEL_NAME = "tiny-llama"
ADAPTER_NAME = "tiny-lora"


@pytest.fixture(scope="module")
def engine_and_adapter(tiny_llama_dir, tmp_path_factory):
    from tests.lora.test_lora import _make_adapter
    from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine

    adapter_dir = str(tmp_path_factory.mktemp("srv_lora") / "adapter")
    _make_adapter(adapter_dir, tiny_llama_dir, seed=3)
    engine_args = EngineArgs(
        model=tiny_llama_dir, dtype="float32", max_model_len=128,
        block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
        enforce_eager=True, disable_log_stats=True,
        enable_lora=True, max_loras=2, max_lora_rank=8)
    return LLMEngine.from_engine_args(engine_args), adapter_dir


def run(sync_engine, adapter_dir, coro_fn):
    from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from neural_magic_vllm_tpu.entrypoints.openai.api_server import build_app

    async def runner():
        engine = AsyncLLMEngine(sync_engine)
        app = build_app(engine, [MODEL_NAME],
                        lora_modules=[(ADAPTER_NAME, adapter_dir)])
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            return await coro_fn(client)
        finally:
            await client.close()
            if engine._background_loop is not None:
                engine._background_loop.cancel()

    return asyncio.run(runner())


def test_lora_module_serving(engine_and_adapter):
    engine, adapter_dir = engine_and_adapter

    async def go(client):
        models = await (await client.get("/v1/models")).json()
        ids = [m["id"] for m in models["data"]]
        assert MODEL_NAME in ids and ADAPTER_NAME in ids

        async def greedy(model):
            r = await client.post("/v1/completions", json={
                "model": model, "prompt": "abcdef", "max_tokens": 8,
                "temperature": 0.0, "ignore_eos": True, "logprobs": 0})
            assert r.status == 200, await r.text()
            body = await r.json()
            return body["choices"][0]["logprobs"]["tokens"]

        base = await greedy(MODEL_NAME)
        adapted = await greedy(ADAPTER_NAME)
        assert base != adapted  # adapter actually applied

        r = await client.post("/v1/completions", json={
            "model": "no-such-adapter", "prompt": "x", "max_tokens": 2})
        assert r.status == 404
        return True

    assert run(engine, adapter_dir, go)


def test_beam_search_via_api(engine_and_adapter):
    engine, adapter_dir = engine_and_adapter

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 6,
            "n": 2, "use_beam_search": True, "temperature": 0.0,
            "ignore_eos": True})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert len(body["choices"]) == 2
        texts = [c["text"] for c in body["choices"]]
        assert texts[0] != texts[1]
        return True

    assert run(engine, adapter_dir, go)
