"""Simple demo API server (reference vllm/entrypoints/api_server.py:29):
POST /generate {"prompt": ..., "stream": bool, **sampling} + GET /health.
Prefer the OpenAI-compatible server for production."""
import argparse
import asyncio
import json

from aiohttp import web

from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import random_uuid
from neural_magic_vllm_tpu.sampling_params import SamplingParams


def build_app(engine: AsyncLLMEngine) -> web.Application:
    app = web.Application()

    async def health(request: web.Request) -> web.Response:
        await engine.check_health()
        return web.Response(status=200)

    async def generate(request: web.Request) -> web.StreamResponse:
        body = await request.json()
        prompt = body.pop("prompt")
        stream = bool(body.pop("stream", False))
        sampling_params = SamplingParams(
            **{k: v for k, v in body.items()
               if k in SamplingParams.__init__.__code__.co_varnames})
        request_id = random_uuid()
        results = engine.generate(prompt=prompt,
                                  sampling_params=sampling_params,
                                  request_id=request_id)
        if stream:
            response = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"})
            await response.prepare(request)
            async for output in results:
                texts = [(output.prompt or "") + o.text
                         for o in output.outputs]
                await response.write(
                    (json.dumps({"text": texts}) + "\0").encode())
            await response.write_eof()
            return response
        final = None
        async for output in results:
            final = output
        texts = [(final.prompt or "") + o.text for o in final.outputs]
        return web.json_response({"text": texts})

    app.router.add_get("/health", health)
    app.router.add_post("/generate", generate)
    return app


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    async def run():
        engine = AsyncLLMEngine.from_engine_args(
            AsyncEngineArgs.from_cli_args(args))
        runner = web.AppRunner(build_app(engine))
        await runner.setup()
        await web.TCPSite(runner, args.host, args.port).start()
        while True:
            await asyncio.sleep(3600)

    asyncio.run(run())


if __name__ == "__main__":
    main()
