"""OpenAI-compatible API server (reference
vllm/entrypoints/openai/api_server.py) on aiohttp (FastAPI is not available
in this environment; the route surface and wire format are identical):

  GET  /health            GET  /version           GET  /v1/models
  GET  /metrics (Prometheus)
  POST /tokenize          POST /detokenize
  POST /v1/completions    POST /v1/chat/completions

Run: python -m neural_magic_vllm_tpu.entrypoints.openai.api_server \
         --model <dir> [--host 0.0.0.0] [--port 8000] ...
"""
import argparse
import asyncio
import importlib
import inspect
import json
import ssl
from typing import AsyncIterator, Optional

from aiohttp import web

from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, DetokenizeRequest,
    DetokenizeResponse, EmbeddingRequest, ErrorResponse, TokenizeRequest,
    TokenizeResponse)
from neural_magic_vllm_tpu.entrypoints.openai.serving_chat import \
    OpenAIServingChat
from neural_magic_vllm_tpu.entrypoints.openai.serving_completion import \
    OpenAIServingCompletion
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.version import __version__

logger = init_logger(__name__)


def _json_response(model, status: int = 200) -> web.Response:
    return web.Response(text=model.model_dump_json(),
                        content_type="application/json", status=status)


def _error(resp: ErrorResponse) -> web.Response:
    body = json.dumps({"error": resp.model_dump()})
    return web.Response(text=body, content_type="application/json",
                        status=resp.code)


async def _maybe_stream(request: web.Request, result) -> web.StreamResponse:
    """Result is an ErrorResponse, a pydantic response, or an async
    generator of SSE strings."""
    if isinstance(result, ErrorResponse):
        return _error(result)
    if inspect.isasyncgen(result):
        response = web.StreamResponse(
            status=200,
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache",
                     "Connection": "keep-alive"})
        await response.prepare(request)
        try:
            async for chunk in result:
                await response.write(chunk.encode())
        except ConnectionResetError:
            pass
        await response.write_eof()
        return response
    return _json_response(result)


def build_app(engine: AsyncLLMEngine, served_model_names,
              chat_template: Optional[str] = None,
              lora_modules=None,
              response_role: str = "assistant") -> web.Application:
    from neural_magic_vllm_tpu.entrypoints.openai.serving_embedding import \
        OpenAIServingEmbedding
    completion = OpenAIServingCompletion(engine, served_model_names,
                                         lora_modules=lora_modules)
    chat = OpenAIServingChat(engine, served_model_names, chat_template,
                             lora_modules=lora_modules,
                             response_role=response_role)
    embedding = OpenAIServingEmbedding(engine, served_model_names)
    app = web.Application()

    async def health(request: web.Request) -> web.Response:
        await engine.check_health()
        return web.Response(status=200)

    async def version(request: web.Request) -> web.Response:
        return web.json_response({"version": __version__})

    async def models(request: web.Request) -> web.Response:
        return _json_response(await completion.show_available_models())

    async def metrics(request: web.Request) -> web.Response:
        import prometheus_client
        data = prometheus_client.generate_latest()
        return web.Response(body=data,
                            content_type="text/plain")

    async def tokenize(request: web.Request) -> web.Response:
        req = TokenizeRequest(**await request.json())
        tok = engine.tokenizer
        if tok is None:
            return _error(completion.create_error_response(
                "no tokenizer loaded"))
        ids = tok.encode(req.prompt,
                         add_special_tokens=req.add_special_tokens)
        return _json_response(TokenizeResponse(
            tokens=ids, count=len(ids),
            max_model_len=completion.max_model_len))

    async def detokenize(request: web.Request) -> web.Response:
        req = DetokenizeRequest(**await request.json())
        tok = engine.tokenizer
        if tok is None:
            return _error(completion.create_error_response(
                "no tokenizer loaded"))
        return _json_response(DetokenizeResponse(
            prompt=tok.decode(req.tokens)))

    async def completions(request: web.Request) -> web.StreamResponse:
        try:
            req = CompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _error(completion.create_error_response(str(e)))
        result = await completion.create_completion(req)
        return await _maybe_stream(request, result)

    async def embeddings(request: web.Request) -> web.Response:
        try:
            req = EmbeddingRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _error(embedding.create_error_response(str(e)))
        result = await embedding.create_embedding(req)
        if isinstance(result, ErrorResponse):
            return _error(result)
        return _json_response(result)

    async def chat_completions(request: web.Request) -> web.StreamResponse:
        try:
            req = ChatCompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _error(chat.create_error_response(str(e)))
        result = await chat.create_chat_completion(req)
        return await _maybe_stream(request, result)

    app.router.add_get("/health", health)
    app.router.add_get("/version", version)
    app.router.add_get("/v1/models", models)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/tokenize", tokenize)
    app.router.add_post("/detokenize", detokenize)
    app.router.add_post("/v1/embeddings", embeddings)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    return app


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="neural-magic-vllm-tpu OpenAI-compatible server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--chat-template", type=str, default=None)
    parser.add_argument("--api-key", type=str, default=None)
    parser.add_argument(
        "--lora-modules", type=str, nargs="+", default=None,
        metavar="NAME=PATH",
        help="LoRA adapters servable by model name "
             "(reference --lora-modules).")
    parser.add_argument(
        "--response-role", type=str, default="assistant",
        help="Role returned when request.add_generation_prompt=true "
             "(reference cli_args.py --response-role).")
    parser.add_argument("--allowed-origins", type=json.loads,
                        default=["*"], help="CORS allowed origins")
    parser.add_argument("--allowed-methods", type=json.loads,
                        default=["*"], help="CORS allowed methods")
    parser.add_argument("--allowed-headers", type=json.loads,
                        default=["*"], help="CORS allowed headers")
    parser.add_argument("--allow-credentials", action="store_true",
                        help="CORS allow credentials")
    parser.add_argument("--ssl-keyfile", type=str, default=None)
    parser.add_argument("--ssl-certfile", type=str, default=None)
    parser.add_argument(
        "--root-path", type=str, default=None,
        help="Route prefix when behind a path-based routing proxy "
             "(reference --root-path).")
    parser.add_argument(
        "--middleware", type=str, action="append", default=[],
        help="Import path of an aiohttp middleware coroutine to add; "
             "repeatable (reference --middleware).")
    parser.add_argument(
        "--no-full-warmup", action="store_true",
        help="Skip the full bucket-lattice warmup the server enables by "
             "default (lazy per-bucket compiles cause TTFT outliers).")
    AsyncEngineArgs.add_cli_args(parser)
    return parser


async def run_server(args) -> None:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    if not getattr(args, "no_full_warmup", False):
        # Serving default: warm the whole bucket lattice. A cold small-
        # batch decode bucket compiling at serve time costs a 10-20s TTFT
        # outlier (measured 8.8x p99-TTFT at 0.5 req/s — PERF.md);
        # offline/bench entrypoints keep the lazy default.
        engine_args.full_warmup = True
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    await serve_engine(engine, args)


async def serve_engine(engine: AsyncLLMEngine, args) -> None:
    """Serve a pre-built engine (shared by run_server and the multi-host
    launcher, which needs to wire the control plane before serving)."""
    engine_args = AsyncEngineArgs.from_cli_args(args)
    served = engine_args.served_model_name
    if served is None:
        served = [engine_args.model]
    elif isinstance(served, str):
        served = [served]
    lora_modules = None
    if getattr(args, "lora_modules", None):
        lora_modules = []
        for item in args.lora_modules:
            name, sep, path = item.partition("=")
            if not sep or not name or not path:
                raise ValueError(
                    f"--lora-modules entries must be NAME=PATH, got {item!r}")
            lora_modules.append((name, path))
    app = build_app(engine, served, args.chat_template, lora_modules,
                    response_role=getattr(args, "response_role",
                                          "assistant"))
    app = wrap_app(app, args)

    ssl_context = None
    if getattr(args, "ssl_certfile", None):
        ssl_context = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_context.load_cert_chain(args.ssl_certfile, args.ssl_keyfile)

    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, args.host, args.port,
                       ssl_context=ssl_context)
    await site.start()
    logger.info("OpenAI server listening on %s:%d", args.host, args.port)
    while True:
        await asyncio.sleep(3600)


def wrap_app(app: web.Application, args) -> web.Application:
    """Apply the server-level CLI policies: API-key auth, CORS, custom
    middleware import paths, and --root-path mounting (reference
    api_server.py middleware / CORSMiddleware setup)."""
    # env fallback (reference VLLM_API_KEY, envs.py:161)
    if not getattr(args, "api_key", None):
        from neural_magic_vllm_tpu import envs
        args.api_key = envs.NMV_TPU_API_KEY
    if args.api_key:
        @web.middleware
        async def auth(request, handler):
            # under --root-path the mounted path keeps its prefix, so
            # match the /v1 segment anywhere in the path
            if "/v1/" in request.path:
                if request.headers.get("Authorization") != \
                        f"Bearer {args.api_key}":
                    return web.Response(status=401)
            return await handler(request)
        app.middlewares.append(auth)

    origins = getattr(args, "allowed_origins", ["*"]) or ["*"]
    methods = getattr(args, "allowed_methods", ["*"]) or ["*"]
    headers = getattr(args, "allowed_headers", ["*"]) or ["*"]
    creds = getattr(args, "allow_credentials", False)

    @web.middleware
    async def cors(request, handler):
        if request.method == "OPTIONS":
            resp = web.Response(status=204)
        else:
            resp = await handler(request)
        origin = request.headers.get("Origin")
        allow = origins[0] if origins != ["*"] else "*"
        if origin and (origins == ["*"] or origin in origins):
            allow = origin if origins != ["*"] else "*"
        resp.headers["Access-Control-Allow-Origin"] = allow
        resp.headers["Access-Control-Allow-Methods"] = ",".join(methods)
        resp.headers["Access-Control-Allow-Headers"] = ",".join(headers)
        if creds:
            resp.headers["Access-Control-Allow-Credentials"] = "true"
        return resp
    app.middlewares.append(cors)

    for path in getattr(args, "middleware", None) or []:
        module, _, attr = path.rpartition(".")
        imported = getattr(importlib.import_module(module), attr)
        app.middlewares.append(imported)

    root_path = getattr(args, "root_path", None)
    if root_path:
        outer = web.Application()
        outer.add_subapp(root_path.rstrip("/"), app)
        app = outer
    return app


def main() -> None:
    args = make_arg_parser().parse_args()
    asyncio.run(run_server(args))


if __name__ == "__main__":
    main()
