"""AsyncLLMEngine: asyncio wrapper around LLMEngine
(reference vllm/engine/async_llm_engine.py:321).

Same design as the reference: a RequestTracker hands new/aborted requests to
a background engine loop; each request gets an AsyncStream of RequestOutputs
consumed by `async for` generators. The blocking engine.step() (host prep +
device dispatch) runs in a worker thread so the event loop stays responsive
while the TPU crunches; a per-iteration watchdog turns hangs into
AsyncEngineDeadError (reference async_timeout/ENGINE_ITERATION_TIMEOUT_S,
async_llm_engine.py:588).
"""
import asyncio
import time
from functools import partial
from typing import (AsyncIterator, Callable, Dict, Iterable, List, Optional,
                    Set, Tuple, Union)

from neural_magic_vllm_tpu import envs
from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.outputs import RequestOutput
from neural_magic_vllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncEngineDeadError(RuntimeError):
    """Background loop crashed or hung (reference async_llm_engine.py:29)."""


def _log_task_completion(task: asyncio.Task,
                         error_callback: Callable[[Exception], None]) -> None:
    try:
        task.result()
    except asyncio.CancelledError:
        return
    except Exception as e:  # noqa: BLE001
        logger.error("Engine background loop failed: %s", e)
        error_callback(e)


class AsyncStream:
    """Per-request output stream (reference AsyncStream,
    async_llm_engine.py:61)."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item: Union[RequestOutput, Exception]) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._queue.put_nowait(StopAsyncIteration())
        self._finished = True

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        result = await self._queue.get()
        if isinstance(result, StopAsyncIteration):
            raise result
        if isinstance(result, Exception):
            raise result
        return result


class RequestTracker:
    """New/aborted request hand-off between API tasks and the engine loop
    (reference RequestTracker, async_llm_engine.py:94)."""

    def __init__(self) -> None:
        self._request_streams: Dict[str, AsyncStream] = {}
        self._aborted_requests: asyncio.Queue = asyncio.Queue()
        self._new_requests: asyncio.Queue = asyncio.Queue()
        self.new_requests_event = asyncio.Event()

    def __contains__(self, item) -> bool:
        return item in self._request_streams

    def __len__(self) -> int:
        return len(self._request_streams)

    def propagate_exception(self, exc: Exception,
                            request_id: Optional[str] = None) -> None:
        if request_id is not None:
            self.abort_request(request_id, exception=exc)
        else:
            for rid in tuple(self._request_streams):
                self.abort_request(rid, exception=exc)

    def add_request(self, request_id: str, **engine_add_request_kwargs
                    ) -> AsyncStream:
        if request_id in self._request_streams:
            raise KeyError(f"Request {request_id} already exists.")
        stream = AsyncStream(request_id)
        self._new_requests.put_nowait(
            (stream, {"request_id": request_id,
                      **engine_add_request_kwargs}))
        self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str,
                      exception: Optional[Exception] = None) -> None:
        self._aborted_requests.put_nowait(request_id)
        stream = self._request_streams.pop(request_id, None)
        if stream is not None and not stream.finished:
            if exception is not None:
                stream.put(exception)
            stream.finish()

    def process_request_output(self, request_output: RequestOutput) -> None:
        request_id = request_output.request_id
        stream = self._request_streams.get(request_id)
        if stream is None:
            return
        stream.put(request_output)
        if request_output.finished:
            stream.finish()
            del self._request_streams[request_id]

    def get_new_and_aborted_requests(self) -> Tuple[List[dict], Set[str]]:
        new_requests: List[dict] = []
        aborted: Set[str] = set()
        while not self._aborted_requests.empty():
            aborted.add(self._aborted_requests.get_nowait())
        while not self._new_requests.empty():
            stream, request = self._new_requests.get_nowait()
            if stream.request_id in aborted:
                stream.finish()
                continue
            self._request_streams[stream.request_id] = stream
            new_requests.append(request)
        self.new_requests_event.clear()
        return new_requests, aborted

    async def wait_for_new_requests(self) -> None:
        if not self.new_requests_event.is_set():
            await self.new_requests_event.wait()


class AsyncLLMEngine:
    """Asyncio front end over LLMEngine (reference AsyncLLMEngine)."""

    def __init__(self, engine: LLMEngine,
                 start_engine_loop: bool = True,
                 tokenizer_pool_size: int = 0) -> None:
        self.engine = engine
        self._request_tracker: Optional[RequestTracker] = None
        self._background_loop: Optional[asyncio.Task] = None
        self._errored_with: Optional[Exception] = None
        self.start_engine_loop = start_engine_loop
        self._tokenizer_pool = None
        if tokenizer_pool_size > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._tokenizer_pool = ThreadPoolExecutor(
                max_workers=tokenizer_pool_size,
                thread_name_prefix="nmv-tok")

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True) -> "AsyncLLMEngine":
        engine_config = engine_args.create_engine_config()
        engine = LLMEngine(engine_config,
                           log_stats=not engine_args.disable_log_stats)
        return cls(engine, start_engine_loop=start_engine_loop,
                   tokenizer_pool_size=getattr(engine_args,
                                               "tokenizer_pool_size", 0))

    # --- loop lifecycle ---------------------------------------------------------
    @property
    def is_running(self) -> bool:
        return (self._background_loop is not None
                and not self._background_loop.done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def _error_callback(self, exc: Exception) -> None:
        self._errored_with = exc
        if self._request_tracker is not None:
            self._request_tracker.propagate_exception(exc)

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from \
                self._errored_with
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        self._request_tracker = RequestTracker()
        self._background_loop = asyncio.get_event_loop().create_task(
            self.run_engine_loop())
        self._background_loop.add_done_callback(
            partial(_log_task_completion,
                    error_callback=self._error_callback))

    async def run_engine_loop(self) -> None:
        timeout = envs.NMV_TPU_ENGINE_ITERATION_TIMEOUT_S
        has_requests_in_progress = False
        while True:
            if not has_requests_in_progress:
                await self._request_tracker.wait_for_new_requests()
            try:
                has_requests_in_progress = await asyncio.wait_for(
                    self.engine_step(), timeout)
            except asyncio.TimeoutError as e:
                logger.error("Engine iteration timed out; engine dead.")
                raise AsyncEngineDeadError(
                    "Engine iteration timed out. This should never happen!"
                ) from e
            await asyncio.sleep(0)

    async def engine_step(self) -> bool:
        """One engine iteration: intake new/aborted requests, step, fan out
        outputs (reference _AsyncLLMEngine.step_async)."""
        new_requests, aborted = \
            self._request_tracker.get_new_and_aborted_requests()
        for request in new_requests:
            try:
                self.engine.add_request(**request)
            except Exception as e:  # noqa: BLE001 (bad request params)
                self._request_tracker.abort_request(request["request_id"],
                                                    exception=e)
        if aborted:
            self.engine.abort_request(aborted)

        if not self.engine.has_unfinished_requests():
            return False
        loop = asyncio.get_event_loop()
        request_outputs = await loop.run_in_executor(None, self.engine.step)
        for request_output in request_outputs:
            self._request_tracker.process_request_output(request_output)
        return self.engine.has_unfinished_requests()

    # --- request API --------------------------------------------------------------
    async def add_request(self, request_id: str, **kwargs) -> AsyncStream:
        if not self.is_running:
            if self.start_engine_loop:
                self.start_background_loop()
            else:
                raise AsyncEngineDeadError(
                    "Background loop is not running.")
        if self._tokenizer_pool is not None and \
                kwargs.get("prompt_token_ids") is None and \
                kwargs.get("prompt") is not None and \
                getattr(self.engine, "tokenizer", None) is not None:
            # --tokenizer-pool-size N: offload prompt tokenization to a
            # thread pool so long prompts never block the event loop /
            # engine step (reference TokenizerGroup pool role,
            # vllm/transformers_utils/tokenizer_group/: Ray actors there,
            # threads here — HF fast tokenizers release the GIL).
            loop = asyncio.get_event_loop()
            kwargs["prompt_token_ids"] = await loop.run_in_executor(
                self._tokenizer_pool, self.engine.tokenizer.encode,
                kwargs["prompt"])
        return self._request_tracker.add_request(request_id, **kwargs)

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
        trace_headers: Optional[Dict[str, str]] = None,
    ) -> AsyncIterator[RequestOutput]:
        """Per-request async generator of cumulative RequestOutputs
        (reference AsyncLLMEngine.generate, async_llm_engine.py:148)."""
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop is dead.") from self._errored_with
        arrival_time = time.time()
        stream = await self.add_request(
            request_id,
            prompt=prompt,
            sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=arrival_time,
            lora_request=lora_request,
            trace_headers=trace_headers,
        )
        try:
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError):
            self._abort(request_id)
            raise

    async def encode(
        self,
        prompt: Optional[str],
        pooling_params,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
    ):
        """Embedding request stream (reference encode,
        async_llm_engine.py)."""
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop is dead.") from self._errored_with
        stream = await self.add_request(
            request_id,
            prompt=prompt,
            sampling_params=None,
            pooling_params=pooling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=time.time(),
            lora_request=lora_request,
        )
        try:
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError):
            self._abort(request_id)
            raise

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("Background loop is not running.")
        self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        self._request_tracker.abort_request(request_id)

    # --- misc ----------------------------------------------------------------------
    async def get_model_config(self):
        return self.engine.model_config

    async def check_health(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop is dead.") from self._errored_with
        self.engine.check_health()

    @property
    def tokenizer(self):
        return self.engine.tokenizer
