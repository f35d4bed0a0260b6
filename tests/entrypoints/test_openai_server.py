"""OpenAI-compatible server e2e (reference tests/entrypoints/
test_openai_server.py strategy, scaled to the tiny offline checkpoint):
the full aiohttp app over a real AsyncLLMEngine, exercised with an aiohttp
test client — completions, chat, streaming SSE, tokenize/detokenize,
models, health, guided choice."""
import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

MODEL_NAME = "tiny-llama"


@pytest.fixture(scope="module")
def app_and_engine(tiny_llama_dir):
    """The sync LLMEngine is built once (expensive); each test wraps it in a
    fresh AsyncLLMEngine + app so the background loop binds to that test's
    event loop (asyncio.run creates a new loop per test)."""
    from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine

    engine_args = EngineArgs(
        model=tiny_llama_dir, dtype="float32", max_model_len=128,
        block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
        enforce_eager=True, disable_log_stats=True)
    return LLMEngine.from_engine_args(engine_args)


def run(sync_engine, coro_fn, wrap_args=None):
    from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from neural_magic_vllm_tpu.entrypoints.openai.api_server import (
        build_app, wrap_app)

    async def runner():
        engine = AsyncLLMEngine(sync_engine)
        app = build_app(engine, [MODEL_NAME])
        if wrap_args is not None:
            app = wrap_app(app, wrap_args)
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


def test_health_version_models(app_and_engine):
    engine = app_and_engine

    async def go(client):
        assert (await client.get("/health")).status == 200
        v = await (await client.get("/version")).json()
        assert "version" in v
        models = await (await client.get("/v1/models")).json()
        assert models["data"][0]["id"] == MODEL_NAME
        return True

    assert run(engine, go)


def test_tokenize_detokenize(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/tokenize", json={"prompt": "hello"})
        assert r.status == 200
        toks = await r.json()
        assert toks["count"] == len(toks["tokens"]) > 0
        r2 = await client.post("/detokenize", json={"tokens":
                                                    toks["tokens"]})
        body = await r2.json()
        assert body["prompt"] == "hello"
        return True

    assert run(engine, go)


def test_completion(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["object"] == "text_completion"
        assert len(body["choices"]) == 1
        assert body["usage"]["completion_tokens"] == 4
        return True

    assert run(engine, go)


def test_completion_logit_bias(app_and_engine):
    """logit_bias (+100 on one token id) must dominate greedy argmax and
    route through the host sampling path (reference protocol.py:258)."""
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True,
            "logprobs": 1, "logit_bias": {"42": 100}})
        assert r.status == 200, await r.text()
        body = await r.json()
        toks = body["choices"][0]["logprobs"]["tokens"]
        assert len(set(toks)) == 1, toks  # +100 bias wins every step
        # bad key -> 400
        r2 = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 2,
            "logit_bias": {"not-an-int": 5}})
        assert r2.status == 400
        return True

    assert run(engine, go)


def test_completion_streaming(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True, "stream": True})
        assert r.status == 200
        chunks = []
        raw = await r.text()
        for line in raw.splitlines():
            if line.startswith("data: "):
                chunks.append(line[len("data: "):])
        assert chunks[-1] == "[DONE]"
        assert len(chunks) >= 2  # at least one delta + DONE
        parsed = json.loads(chunks[0])
        assert parsed["object"] == "text_completion"
        return True

    assert run(engine, go)


def test_chat_completion(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/chat/completions", json={
            "model": MODEL_NAME,
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        return True

    assert run(engine, go)


def test_bad_model_404(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": "nope", "prompt": "x", "max_tokens": 2})
        assert r.status == 404
        return True

    assert run(engine, go)


def test_over_long_prompt_rejected(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "a" * 4000, "max_tokens": 2})
        assert r.status == 400
        return True

    assert run(engine, go)


def test_guided_choice(app_and_engine):
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "pick", "max_tokens": 8,
            "temperature": 0.0, "guided_choice": ["yes", "no"]})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["choices"][0]["text"] in ("yes", "no")
        return True

    assert run(engine, go)


def test_guided_grammar(app_and_engine):
    """CFG backend over the server (reference CFGLogitsProcessor role)."""
    engine = app_and_engine
    grammar = 'expr: num | expr "+" num\nnum: [0-9]+'

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "calc", "max_tokens": 12,
            "temperature": 1.0, "seed": 3, "guided_grammar": grammar})
        assert r.status == 200, await r.text()
        body = await r.json()
        text = body["choices"][0]["text"]
        import re as _re
        assert _re.fullmatch(r"[0-9]+(\+[0-9]+)*", text), text
        return True

    assert run(engine, go)


def test_response_format_json_object(app_and_engine):
    """response_format={"type": "json_object"} constrains output to valid
    JSON via the CFG backend (reference outlines_decoding.py:105-107)."""
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "j", "max_tokens": 24,
            "temperature": 1.0, "seed": 7,
            "response_format": {"type": "json_object"}})
        assert r.status == 200, await r.text()
        body = await r.json()
        text = body["choices"][0]["text"]
        # every emitted char must be a valid JSON prefix per the grammar
        from neural_magic_vllm_tpu.guided_decoding import JSON_GRAMMAR
        from neural_magic_vllm_tpu.guided_decoding.cfg import CFGuide
        guide = CFGuide(JSON_GRAMMAR, [])
        charts = guide.initial
        for ch in text:
            charts = guide.advance(charts, ch)
            assert charts is not None, text
        return True

    assert run(engine, go)


def test_named_tool_call(app_and_engine):
    """tool_choice naming a function forces guided-JSON output returned
    as tool_calls (reference serving_chat.py:530-540,
    guided_decoding/__init__.py:31)."""
    engine = app_and_engine

    async def go(client):
        req = {
            "model": MODEL_NAME,
            "messages": [{"role": "user", "content": "call the tool"}],
            "max_tokens": 32, "temperature": 0.0,
            "tools": [{"type": "function", "function": {
                "name": "get_n", "parameters": {
                    "type": "object",
                    "properties": {"n": {"type": "integer"}},
                    "required": ["n"]}}}],
            "tool_choice": {"type": "function",
                            "function": {"name": "get_n"}},
        }
        r = await client.post("/v1/chat/completions", json=req)
        assert r.status == 200, await r.text()
        body = await r.json()
        msg = body["choices"][0]["message"]
        assert msg["tool_calls"], body
        call = msg["tool_calls"][0]
        assert call["function"]["name"] == "get_n"
        assert call["function"]["arguments"].startswith("{")
        # unknown tool name -> 400
        bad = dict(req)
        bad["tool_choice"] = {"type": "function",
                              "function": {"name": "nope"}}
        r2 = await client.post("/v1/chat/completions", json=bad)
        assert r2.status == 400
        return True

    assert run(engine, go)


def test_stream_include_usage(app_and_engine):
    """stream_options.include_usage emits a final usage-only chunk
    (reference protocol.py:105 StreamOptions)."""
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True, "stream": True,
            "stream_options": {"include_usage": True}})
        assert r.status == 200
        chunks = [line[len("data: "):]
                  for line in (await r.text()).splitlines()
                  if line.startswith("data: ")]
        assert chunks[-1] == "[DONE]"
        usage = json.loads(chunks[-2])
        assert usage["choices"] == []
        assert usage["usage"]["completion_tokens"] == 4
        assert usage["usage"]["total_tokens"] == \
            usage["usage"]["prompt_tokens"] + 4
        return True

    assert run(engine, go)


def test_streaming_logprobs(app_and_engine):
    """Streaming chunks carry per-delta logprobs (reference
    serving_completion.py:255-283)."""
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": MODEL_NAME, "prompt": "abc", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True, "stream": True,
            "logprobs": 1})
        assert r.status == 200
        chunks = [json.loads(line[len("data: "):])
                  for line in (await r.text()).splitlines()
                  if line.startswith("data: ")
                  and not line.endswith("[DONE]")]
        toks = []
        lps = []
        for c in chunks:
            lp = c["choices"][0]["logprobs"]
            assert lp is not None
            toks += lp["tokens"]
            lps += lp["token_logprobs"]
        assert len(toks) == 4
        assert all(isinstance(x, float) for x in lps)
        return True

    assert run(engine, go)


def test_server_policies(app_and_engine):
    """wrap_app: API-key auth (401 without Bearer), CORS headers, and
    --root-path mounting (reference cli_args.py --api-key/--root-path +
    CORSMiddleware defaults)."""
    import argparse
    engine = app_and_engine
    args = argparse.Namespace(
        api_key="sekret", allowed_origins=["*"], allowed_methods=["*"],
        allowed_headers=["*"], allow_credentials=False,
        middleware=[], root_path="/proxy")

    async def go(client):
        # unauthenticated /v1 -> 401; /health outside /v1 passes
        r = await client.post("/proxy/v1/completions", json={
            "model": MODEL_NAME, "prompt": "x", "max_tokens": 2})
        assert r.status == 401
        r = await client.get("/proxy/health")
        assert r.status == 200
        assert r.headers["Access-Control-Allow-Origin"] == "*"
        # authenticated completion through the root path
        r = await client.post(
            "/proxy/v1/completions",
            json={"model": MODEL_NAME, "prompt": "x", "max_tokens": 2,
                  "temperature": 0.0, "ignore_eos": True},
            headers={"Authorization": "Bearer sekret"})
        assert r.status == 200, await r.text()
        # unmounted path -> 404
        r = await client.get("/health")
        assert r.status == 404
        return True

    assert run(engine, go, wrap_args=args)


def test_response_role(app_and_engine):
    """--response-role flows into chat responses; with
    add_generation_prompt=False the last message's role is returned
    (reference get_chat_request_role)."""
    engine = app_and_engine

    async def go(client):
        r = await client.post("/v1/chat/completions", json={
            "model": MODEL_NAME,
            "messages": [{"role": "user", "content": "hi"},
                         {"role": "assistant", "content": "partial"}],
            "add_generation_prompt": False, "echo": True,
            "max_tokens": 2, "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200, await r.text()
        body = await r.json()
        msg = body["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert msg["content"].startswith("partial")  # echo prefix
        return True

    assert run(engine, go)


def test_embeddings_endpoint(tmp_path_factory, tiny_llama_dir):
    """/v1/embeddings over a bare-backbone (embedding) model."""
    import json
    import os
    import shutil

    from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
    d = str(tmp_path_factory.mktemp("embsrv") / "llama-embed")
    shutil.copytree(tiny_llama_dir, d)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["LlamaModel"]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    engine = LLMEngine.from_engine_args(EngineArgs(
        model=d, dtype="float32", max_model_len=128, block_size=16,
        num_gpu_blocks_override=64, max_num_seqs=8, enforce_eager=True,
        disable_log_stats=True))

    async def go(client):
        r = await client.post("/v1/embeddings", json={
            "model": MODEL_NAME, "input": ["hello", "world"]})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert len(body["data"]) == 2
        assert len(body["data"][0]["embedding"]) == 64  # hidden size
        return True

    assert run(engine, go)
