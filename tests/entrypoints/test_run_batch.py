"""Batch runner e2e (reference entrypoints/openai/run_batch.py)."""
import asyncio
import json


def test_run_batch(tiny_llama_dir, tmp_path):
    from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
    from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
    from neural_magic_vllm_tpu.entrypoints.openai import run_batch

    sync_engine = LLMEngine.from_engine_args(EngineArgs(
        model=tiny_llama_dir, dtype="float32", max_model_len=128,
        block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
        enforce_eager=True, disable_log_stats=True))

    requests = [
        {"custom_id": "r1", "method": "POST", "url": "/v1/completions",
         "body": {"model": "m", "prompt": "hello", "max_tokens": 4,
                  "temperature": 0, "ignore_eos": True}},
        {"custom_id": "r2", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"model": "m",
                  "messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "temperature": 0, "ignore_eos": True}},
        {"custom_id": "r3", "method": "POST", "url": "/v1/bogus",
         "body": {}},
    ]

    async def go():
        engine = AsyncLLMEngine(sync_engine)
        from neural_magic_vllm_tpu.entrypoints.openai.serving_chat import \
            OpenAIServingChat
        from neural_magic_vllm_tpu.entrypoints.openai.\
            serving_completion import OpenAIServingCompletion
        from neural_magic_vllm_tpu.entrypoints.openai.\
            serving_embedding import OpenAIServingEmbedding
        handlers = {
            "chat": OpenAIServingChat(engine, ["m"]),
            "completion": OpenAIServingCompletion(engine, ["m"]),
            "embedding": OpenAIServingEmbedding(engine, ["m"]),
        }
        return await asyncio.gather(*(run_batch.run_request(
            handlers, json.dumps(r)) for r in requests))

    results = asyncio.run(go())
    by_id = {r["custom_id"]: r for r in results}
    assert by_id["r1"]["response"]["status_code"] == 200
    assert by_id["r1"]["response"]["body"]["object"] == "text_completion"
    assert by_id["r2"]["response"]["status_code"] == 200
    assert by_id["r3"]["error"] is not None
