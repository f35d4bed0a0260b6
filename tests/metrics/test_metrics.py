"""Engine stats + Prometheus metrics (reference tests/metrics/test_metrics.py):
counters/gauges/histograms must reflect a real engine run."""
import pytest

from neural_magic_vllm_tpu import LLM, SamplingParams
from neural_magic_vllm_tpu.engine.metrics import (Stats, StatLogger,
                                                  build_1_2_5_buckets)


def test_build_1_2_5_buckets():
    assert build_1_2_5_buckets(100) == [1, 2, 5, 10, 20, 50, 100]
    assert build_1_2_5_buckets(7) == [1, 2, 5]
    assert build_1_2_5_buckets(0) == []


def _sample_value(name, model_name):
    from prometheus_client import REGISTRY
    v = REGISTRY.get_sample_value(name, {"model_name": model_name})
    return 0.0 if v is None else v


@pytest.fixture(scope="module")
def metrics_llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
               disable_log_stats=False, enforce_eager=True)


def test_engine_run_updates_prometheus(metrics_llm, tiny_llama_dir):
    llm = metrics_llm
    model_name = llm.llm_engine.model_config.model
    before_prompt = _sample_value("nmv_tpu:prompt_tokens_total", model_name)
    before_gen = _sample_value("nmv_tpu:generation_tokens_total", model_name)
    before_ttft = _sample_value(
        "nmv_tpu:time_to_first_token_seconds_count", model_name)

    prompts = ["hello metrics", "second request with more words"]
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.0, max_tokens=8))
    n_prompt = sum(len(o.prompt_token_ids) for o in outs)
    n_gen = sum(len(c.token_ids) for o in outs for c in o.outputs)
    assert n_gen == 2 * 8

    assert _sample_value("nmv_tpu:prompt_tokens_total",
                         model_name) - before_prompt == n_prompt
    # each request's FIRST token comes out of its prefill iteration and
    # counts as a GENERATION token (reference llm_engine.py:993-995:
    # num_generation_tokens_from_prefill_groups += seq_group.num_seqs())
    assert _sample_value("nmv_tpu:generation_tokens_total",
                         model_name) - before_gen == n_gen
    # one TTFT observation per request
    assert _sample_value("nmv_tpu:time_to_first_token_seconds_count",
                         model_name) - before_ttft == len(prompts)
    # e2e latency histogram sees every finished request
    assert _sample_value("nmv_tpu:e2e_request_latency_seconds_count",
                         model_name) >= len(prompts)


def test_beam_search_does_not_crash_stat_logger(metrics_llm):
    """Regression: the old delta-based generation-token count went
    negative when beam pruning / early stopping removed sequences (with
    their whole output histories) mid-step, and prometheus Counter.inc()
    raises on negatives. Appended-token counting keeps it >= 0."""
    llm = metrics_llm
    model_name = llm.llm_engine.model_config.model
    before_gen = _sample_value("nmv_tpu:generation_tokens_total", model_name)
    outs = llm.generate(
        ["beam me", "up scotty with a longer prompt"],
        SamplingParams(temperature=0.0, max_tokens=12, n=2, best_of=4,
                       use_beam_search=True, early_stopping=False))
    assert all(len(o.outputs) == 2 for o in outs)
    # counter moved forward (never raised / never went negative)
    assert _sample_value("nmv_tpu:generation_tokens_total",
                         model_name) > before_gen


def test_queue_gauges_settle_to_zero(metrics_llm):
    llm = metrics_llm
    model_name = llm.llm_engine.model_config.model
    llm.generate(["drain"], SamplingParams(temperature=0.0, max_tokens=4))
    assert _sample_value("nmv_tpu:num_requests_running", model_name) == 0
    assert _sample_value("nmv_tpu:num_requests_waiting", model_name) == 0
    assert _sample_value("nmv_tpu:num_requests_swapped", model_name) == 0


def test_preemption_counter_via_stat_logger():
    sl = StatLogger("preempt-model", max_model_len=64)
    if sl.metrics is None:  # pragma: no cover - prometheus missing
        pytest.skip("prometheus_client unavailable")
    before = _sample_value("nmv_tpu:num_preemptions_total", "preempt-model")
    sl.log(Stats(now=0.0, num_preemption_iter=3))
    assert _sample_value("nmv_tpu:num_preemptions_total",
                         "preempt-model") - before == 3
