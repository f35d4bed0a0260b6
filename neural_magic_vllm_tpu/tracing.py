"""OTLP tracing (reference vllm/tracing.py): lazy OpenTelemetry import,
per-request spans with gen-ai semantic-convention attributes."""
from typing import Optional

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


class SpanAttributes:
    LLM_REQUEST_ID = "gen_ai.request.id"
    LLM_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    LLM_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    LLM_LATENCY_TIME_TO_FIRST_TOKEN = "gen_ai.latency.time_to_first_token"
    LLM_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    LLM_LATENCY_E2E = "gen_ai.latency.e2e"
    LLM_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    LLM_REQUEST_TOP_P = "gen_ai.request.top_p"
    LLM_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    LLM_REQUEST_N = "gen_ai.request.n"


def is_otel_available() -> bool:
    try:
        import opentelemetry  # noqa: F401
        return True
    except ImportError:
        return False


def init_tracer(instrumenting_module_name: str,
                otlp_traces_endpoint: str):
    try:
        from opentelemetry import trace
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
        try:
            from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
                import OTLPSpanExporter
        except ImportError:
            from opentelemetry.exporter.otlp.proto.http.trace_exporter \
                import OTLPSpanExporter
        provider = TracerProvider(
            resource=Resource.create({"service.name": "nmv-tpu"}))
        provider.add_span_processor(
            BatchSpanProcessor(
                OTLPSpanExporter(endpoint=otlp_traces_endpoint)))
        return provider.get_tracer(instrumenting_module_name)
    except Exception as e:
        logger.warning("OTLP tracing unavailable: %s", e)
        return None


def extract_trace_headers(headers) -> Optional[dict]:
    if headers is None:
        return None
    lower = {k.lower(): v for k, v in dict(headers).items()}
    return {
        k: lower[k]
        for k in ("traceparent", "tracestate") if k in lower
    } or None
