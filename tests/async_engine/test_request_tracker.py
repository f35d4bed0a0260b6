"""RequestTracker hand-off semantics (reference
tests/async_engine/test_request_tracker.py)."""
import asyncio

import pytest


def run(coro):
    return asyncio.run(coro)

from neural_magic_vllm_tpu.engine.async_llm_engine import (AsyncStream,
                                                           RequestTracker)
from neural_magic_vllm_tpu.outputs import CompletionOutput, RequestOutput


def _finished_output(request_id: str, finished: bool = True) -> RequestOutput:
    return RequestOutput(
        request_id=request_id, prompt="p", prompt_token_ids=[1],
        prompt_logprobs=None,
        outputs=[CompletionOutput(index=0, text="", token_ids=[2],
                                  cumulative_logprob=0.0, logprobs=None)],
        finished=finished)


async def _impl_test_request_tracker():
    tracker = RequestTracker()
    stream_1 = tracker.add_request("1")
    assert tracker.new_requests_event.is_set()
    new, aborted = tracker.get_new_and_aborted_requests()
    assert not tracker.new_requests_event.is_set()
    assert len(new) == 1 and new[0]["request_id"] == "1"
    assert not aborted and not stream_1.finished
    assert "1" in tracker and len(tracker) == 1

    # duplicate ids are rejected
    with pytest.raises(KeyError):
        tracker.add_request("1")

    # adding a new request sets the event again
    stream_2 = tracker.add_request("2")
    assert tracker.new_requests_event.is_set()

    # abort before the engine picks it up: never handed to the engine
    tracker.add_request("3")
    tracker.abort_request("3")
    new, aborted = tracker.get_new_and_aborted_requests()
    assert "3" in aborted
    assert all(r["request_id"] != "3" for r in new)
    assert "3" not in tracker

    # abort a live request: stream finishes, engine told to abort
    tracker.abort_request("1")
    new, aborted = tracker.get_new_and_aborted_requests()
    assert "1" in aborted
    assert stream_1.finished
    with pytest.raises(StopAsyncIteration):
        await stream_1.__anext__()

    # finished output closes and unregisters the stream
    tracker.process_request_output(_finished_output("2"))
    out = await stream_2.__anext__()
    assert out.request_id == "2"
    assert stream_2.finished
    assert "2" not in tracker


async def _impl_test_propagate_exception_all_streams():
    tracker = RequestTracker()
    streams = [tracker.add_request(str(i)) for i in range(3)]
    tracker.get_new_and_aborted_requests()
    tracker.propagate_exception(RuntimeError("engine dead"))
    for s in streams:
        with pytest.raises(RuntimeError, match="engine dead"):
            await s.__anext__()


async def _impl_test_stream_iteration_and_wait():
    tracker = RequestTracker()
    stream = tracker.add_request("x")
    tracker.get_new_and_aborted_requests()

    tracker.process_request_output(_finished_output("x", finished=False))
    tracker.process_request_output(_finished_output("x", finished=True))
    got = [out async for out in stream]
    assert len(got) == 2

    # wait_for_new_requests returns immediately when the event is set
    tracker.add_request("y")
    await asyncio.wait_for(tracker.wait_for_new_requests(), timeout=1.0)


class _Pushed(Exception):
    pass


async def _impl_test_stream_raises_pushed_exception():
    stream = AsyncStream("r")
    stream.put(_Pushed("boom"))
    with pytest.raises(_Pushed):
        await stream.__anext__()


def test_request_tracker():
    run(_impl_test_request_tracker())


def test_propagate_exception_all_streams():
    run(_impl_test_propagate_exception_all_streams())


def test_stream_iteration_and_wait():
    run(_impl_test_stream_iteration_and_wait())


def test_stream_raises_pushed_exception():
    run(_impl_test_stream_raises_pushed_exception())
