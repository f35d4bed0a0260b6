"""Per-request OTLP span emission (reference tests/tracing/test_tracing.py).

The opentelemetry SDK is not installed in this environment, so the engine's
span emission is exercised with an injected stub tracer that records the
same start_as_current_span/set_attribute surface; header propagation and
the graceful-degradation path are tested directly.
"""
from contextlib import contextmanager

from neural_magic_vllm_tpu import LLM, SamplingParams
from neural_magic_vllm_tpu.tracing import (SpanAttributes,
                                           extract_trace_headers,
                                           is_otel_available)


class _StubSpan:

    def __init__(self, name, start_time):
        self.name = name
        self.start_time = start_time
        self.attributes = {}

    def set_attribute(self, key, value):
        self.attributes[key] = value


class _StubTracer:

    def __init__(self):
        self.spans = []

    @contextmanager
    def start_as_current_span(self, name, start_time=None):
        span = _StubSpan(name, start_time)
        self.spans.append(span)
        yield span


def test_extract_trace_headers():
    assert extract_trace_headers(None) is None
    assert extract_trace_headers({"content-type": "application/json"}) is None
    headers = {"TraceParent": "00-abc-def-01", "tracestate": "x=1",
               "authorization": "secret"}
    out = extract_trace_headers(headers)
    assert out == {"traceparent": "00-abc-def-01", "tracestate": "x=1"}


def test_init_tracer_degrades_without_sdk():
    if is_otel_available():  # pragma: no cover - env has the sdk
        return
    from neural_magic_vllm_tpu.tracing import init_tracer
    assert init_tracer("nmv_tpu.test", "http://localhost:4317") is None


def test_engine_emits_request_spans(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              enforce_eager=True)
    tracer = _StubTracer()
    llm.llm_engine.tracer = tracer

    prompts = ["trace me", "and me too"]
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.0, max_tokens=6))

    assert len(tracer.spans) == len(prompts)
    by_id = {s.attributes[SpanAttributes.LLM_REQUEST_ID]: s
             for s in tracer.spans}
    assert len(by_id) == len(prompts)
    for out in outs:
        span = by_id[out.request_id]
        assert span.name == "llm_request"
        assert span.attributes[SpanAttributes.LLM_PROMPT_TOKENS] == \
            len(out.prompt_token_ids)
        assert span.attributes[SpanAttributes.LLM_COMPLETION_TOKENS] == 6
        # latency attributes are present and sane
        ttft = span.attributes[
            SpanAttributes.LLM_LATENCY_TIME_TO_FIRST_TOKEN]
        e2e = span.attributes[SpanAttributes.LLM_LATENCY_E2E]
        assert 0 <= ttft <= e2e
        # span start time is the request arrival in epoch-nanoseconds
        assert span.start_time > 1e18
