"""Benchmark: TinyLlama-1.1B-architecture bf16 greedy decode on one chip
(BASELINE.json config 1), through the full engine (scheduler + runner +
detokenizer-off), measuring steady-state decode tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = fraction of the bandwidth speed-of-light for this chip
(decode is weight-bandwidth-bound: params_bytes / HBM_BW per token per
batch-row; v5e-lite ~819 GB/s).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT_LEN", "128"))
DECODE_STEPS = int(os.environ.get("BENCH_DECODE_STEPS", "128"))
HBM_BW_GBS = float(os.environ.get("BENCH_HBM_BW_GBS", "819"))
SCHED_STEPS = int(os.environ.get("BENCH_SCHEDULER_STEPS", "16"))


def main():
    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              ModelConfig, ParallelConfig,
                                              SchedulerConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    # TinyLlama-1.1B architecture.
    hf_cfg = LlamaConfig(vocab_size=32000, hidden_size=2048,
                         intermediate_size=5632, num_hidden_layers=22,
                         num_attention_heads=32, num_key_value_heads=4,
                         max_position_embeddings=2048,
                         torch_dtype="bfloat16")
    hf_cfg.architectures = ["LlamaForCausalLM"]
    model_config = ModelConfig(model="tinyllama-1.1b-bench",
                               dtype="bfloat16", max_model_len=1024,
                               hf_config=hf_cfg, skip_tokenizer_init=True)
    engine_config = EngineConfig(
        model_config=model_config,
        cache_config=CacheConfig(block_size=16, hbm_utilization=0.9),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_num_seqs=max(BATCH, 8),
                                         max_model_len=1024,
                                         max_num_batched_tokens=1024,
                                         num_scheduler_steps=SCHED_STEPS),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="dummy"),
    )
    engine = LLMEngine(engine_config, log_stats=False)

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE_STEPS + 8,
                        ignore_eos=True, detokenize=False)
    for i in range(BATCH):
        ids = rng.integers(1, 32000, size=PROMPT_LEN).tolist()
        engine.add_request(str(i), prompt_token_ids=ids, sampling_params=sp)

    # Prefill + first decode steps include compilation; run until all
    # sequences are decoding, then time the steady state.
    warm_steps = 0
    while warm_steps < 6:
        engine.step()
        warm_steps += 1

    t0 = time.perf_counter()
    steps = 0
    while steps < DECODE_STEPS and engine.has_unfinished_requests():
        engine.step()
        steps += SCHED_STEPS
    dt = time.perf_counter() - t0
    tok_per_s = BATCH * steps / dt

    # Speed of light: every decode step must stream all weights once
    # (batch amortizes); ignores KV reads (small at this context).
    params_bytes = 2 * (
        32000 * 2048 * 2  # embed + lm_head
        + 22 * (2048 * (2048 + 2 * 256 + 2048) +  # q,k,v,o (kv=4 heads*64)
                3 * 2048 * 5632))
    sol_steps_per_s = HBM_BW_GBS * 1e9 / params_bytes
    sol_tok_per_s = sol_steps_per_s * BATCH
    print(json.dumps({
        "metric": f"decode_tokens_per_s_tinyllama1.1b_bf16_bs{BATCH}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
    }))


if __name__ == "__main__":
    main()
