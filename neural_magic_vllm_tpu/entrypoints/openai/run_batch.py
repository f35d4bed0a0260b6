"""Offline batch runner for OpenAI-format batch files (reference
vllm/entrypoints/openai/run_batch.py): reads a JSONL of
{"custom_id", "method", "url", "body"} requests (/v1/chat/completions or
/v1/completions or /v1/embeddings), serves them through one engine, writes
a JSONL of responses.

python -m neural_magic_vllm_tpu.entrypoints.openai.run_batch \
    -i requests.jsonl -o results.jsonl --model <dir>
"""
import argparse
import asyncio
import json

from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, EmbeddingRequest,
    ErrorResponse, random_uuid)
from neural_magic_vllm_tpu.entrypoints.openai.serving_chat import \
    OpenAIServingChat
from neural_magic_vllm_tpu.entrypoints.openai.serving_completion import \
    OpenAIServingCompletion
from neural_magic_vllm_tpu.entrypoints.openai.serving_embedding import \
    OpenAIServingEmbedding
from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


async def run_request(handlers, line: str) -> dict:
    req = json.loads(line)
    url = req.get("url", "/v1/chat/completions")
    body = req.get("body", {})
    try:
        if url.endswith("/chat/completions"):
            response = await handlers["chat"].create_chat_completion(
                ChatCompletionRequest(**body))
        elif url.endswith("/completions"):
            response = await handlers["completion"].create_completion(
                CompletionRequest(**body))
        elif url.endswith("/embeddings"):
            response = await handlers["embedding"].create_embedding(
                EmbeddingRequest(**body))
        else:
            response = ErrorResponse(message=f"unsupported url {url}",
                                     type="BadRequestError")
    except Exception as e:  # noqa: BLE001
        response = ErrorResponse(message=str(e), type="InternalServerError",
                                 code=500)
    ok = not isinstance(response, ErrorResponse)
    return {
        "id": f"batch-{random_uuid()}",
        "custom_id": req.get("custom_id"),
        "response": {
            "status_code": 200 if ok else response.code,
            "body": json.loads(response.model_dump_json()),
        },
        "error": None if ok else response.message,
    }


async def main(args) -> None:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served = [engine_args.served_model_name or engine_args.model] \
        if not isinstance(engine_args.served_model_name, list) \
        else engine_args.served_model_name
    handlers = {
        "chat": OpenAIServingChat(engine, served),
        "completion": OpenAIServingCompletion(engine, served),
        "embedding": OpenAIServingEmbedding(engine, served),
    }
    with open(args.input_file) as f:
        lines = [ln for ln in f if ln.strip()]
    results = await asyncio.gather(
        *(run_request(handlers, ln) for ln in lines))
    with open(args.output_file, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    logger.info("wrote %d results to %s", len(results), args.output_file)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input-file", required=True)
    parser.add_argument("-o", "--output-file", required=True)
    AsyncEngineArgs.add_cli_args(parser)
    asyncio.run(main(parser.parse_args()))
