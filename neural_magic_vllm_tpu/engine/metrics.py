"""Engine stats + Prometheus metrics (reference vllm/engine/metrics.py:31).

Gauges for queue depths and cache usage, counters for token throughput and
preemptions, histograms for TTFT/TPOT/e2e with 1-2-5 buckets; a logging
stat-logger prints 5s summaries. /metrics in the API server exposes the
Prometheus registry.
"""
import time
from dataclasses import dataclass, field
from typing import List, Optional

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_LOCAL_LOGGING_INTERVAL_SEC = 5.0


def build_1_2_5_buckets(max_value: int) -> List[int]:
    """[1, 2, 5, 10, 20, 50, ...] up to max_value
    (reference metrics.py:175)."""
    mantissa_lst = [1, 2, 5]
    exponent = 0
    buckets: List[int] = []
    while True:
        for m in mantissa_lst:
            value = m * 10**exponent
            if value <= max_value:
                buckets.append(value)
            else:
                return buckets
        exponent += 1


@dataclass
class Stats:
    """Snapshot of one engine iteration (reference metrics.py:198)."""
    now: float
    num_running_sys: int = 0
    num_waiting_sys: int = 0
    num_swapped_sys: int = 0
    gpu_cache_usage_sys: float = 0.0
    num_prompt_tokens_iter: int = 0
    num_generation_tokens_iter: int = 0
    num_preemption_iter: int = 0
    time_to_first_tokens_iter: List[float] = field(default_factory=list)
    time_per_output_tokens_iter: List[float] = field(default_factory=list)
    time_e2e_requests: List[float] = field(default_factory=list)
    spec_decode_metrics: object = None  # SpecDecodeWorkerMetrics


class Metrics:
    """Prometheus metric family (reference metrics.py:31)."""

    def __init__(self, labelnames: List[str], max_model_len: int) -> None:
        from prometheus_client import Counter, Gauge, Histogram
        self.gauge_scheduler_running = Gauge(
            "nmv_tpu:num_requests_running",
            "Number of requests currently running.", labelnames)
        self.gauge_scheduler_waiting = Gauge(
            "nmv_tpu:num_requests_waiting",
            "Number of requests waiting to be processed.", labelnames)
        self.gauge_scheduler_swapped = Gauge(
            "nmv_tpu:num_requests_swapped",
            "Number of requests swapped to CPU.", labelnames)
        self.gauge_gpu_cache_usage = Gauge(
            "nmv_tpu:gpu_cache_usage_perc",
            "Device KV-cache usage (1 = full).", labelnames)
        self.counter_prompt_tokens = Counter(
            "nmv_tpu:prompt_tokens_total",
            "Number of prefill tokens processed.", labelnames)
        self.counter_generation_tokens = Counter(
            "nmv_tpu:generation_tokens_total",
            "Number of generation tokens processed.", labelnames)
        self.counter_num_preemption = Counter(
            "nmv_tpu:num_preemptions_total",
            "Cumulative number of preemptions.", labelnames)
        self.histogram_time_to_first_token = Histogram(
            "nmv_tpu:time_to_first_token_seconds",
            "Histogram of TTFT in seconds.", labelnames,
            buckets=[
                0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5,
                0.75, 1.0, 2.5, 5.0, 7.5, 10.0
            ])
        self.histogram_time_per_output_token = Histogram(
            "nmv_tpu:time_per_output_token_seconds",
            "Histogram of TPOT in seconds.", labelnames,
            buckets=[
                0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5,
                0.75, 1.0, 2.5
            ])
        self.histogram_e2e_request_latency = Histogram(
            "nmv_tpu:e2e_request_latency_seconds",
            "Histogram of end-to-end request latency in seconds.",
            labelnames, buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0,
                                 40.0, 50.0, 60.0])


_METRICS_SINGLETON: Optional[Metrics] = None


class StatLogger:
    """Logs to stdout every 5s and mirrors into Prometheus
    (reference LoggingStatLogger + PrometheusStatLogger,
    metrics.py:267,332)."""

    def __init__(self, model_name: str, max_model_len: int = 2048) -> None:
        self.model_name = model_name
        self.last_local_log = time.time()
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        global _METRICS_SINGLETON
        try:
            if _METRICS_SINGLETON is None:
                _METRICS_SINGLETON = Metrics(labelnames=["model_name"],
                                             max_model_len=max_model_len)
            self.metrics: Optional[Metrics] = _METRICS_SINGLETON
        except Exception:  # pragma: no cover - prometheus missing
            self.metrics = None

    def log(self, stats: Stats) -> None:
        self.num_prompt_tokens.append(stats.num_prompt_tokens_iter)
        self.num_generation_tokens.append(stats.num_generation_tokens_iter)

        if self.metrics is not None:
            label = {"model_name": self.model_name}
            m = self.metrics
            m.gauge_scheduler_running.labels(**label).set(
                stats.num_running_sys)
            m.gauge_scheduler_waiting.labels(**label).set(
                stats.num_waiting_sys)
            m.gauge_scheduler_swapped.labels(**label).set(
                stats.num_swapped_sys)
            m.gauge_gpu_cache_usage.labels(**label).set(
                stats.gpu_cache_usage_sys)
            m.counter_prompt_tokens.labels(**label).inc(
                stats.num_prompt_tokens_iter)
            m.counter_generation_tokens.labels(**label).inc(
                stats.num_generation_tokens_iter)
            if stats.num_preemption_iter:
                m.counter_num_preemption.labels(**label).inc(
                    stats.num_preemption_iter)
            for t in stats.time_to_first_tokens_iter:
                m.histogram_time_to_first_token.labels(**label).observe(t)
            for t in stats.time_per_output_tokens_iter:
                m.histogram_time_per_output_token.labels(**label).observe(t)
            for t in stats.time_e2e_requests:
                m.histogram_e2e_request_latency.labels(**label).observe(t)

        now = stats.now
        elapsed = now - self.last_local_log
        if elapsed > _LOCAL_LOGGING_INTERVAL_SEC:
            prompt_tps = sum(self.num_prompt_tokens) / elapsed
            gen_tps = sum(self.num_generation_tokens) / elapsed
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, Avg generation "
                "throughput: %.1f tokens/s, Running: %d reqs, Swapped: %d "
                "reqs, Pending: %d reqs, KV cache usage: %.1f%%",
                prompt_tps, gen_tps, stats.num_running_sys,
                stats.num_swapped_sys, stats.num_waiting_sys,
                stats.gpu_cache_usage_sys * 100)
            if stats.spec_decode_metrics is not None:
                sm = stats.spec_decode_metrics
                logger.info(
                    "Speculative metrics: draft acceptance rate %.3f, "
                    "system efficiency %.2f tokens/step "
                    "(accepted %d / proposed %d)",
                    sm.draft_acceptance_rate, sm.system_efficiency,
                    sm.accepted_tokens, sm.num_spec_tokens)
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
            self.last_local_log = now
