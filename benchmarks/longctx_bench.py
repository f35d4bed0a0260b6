"""Long-context on-chip evidence (VERDICT r3 ask #7).

For the 8B W4A16 bench target at context depths 1k/4k/8k, measures:
  - context-prefill TTFT (one full-prompt prefill dispatch, steady state),
  - steady-state decode ms/step and tokens/s at that depth,
  - the same with a 1k sliding window (mistral-style), validating the
    decode kernel's chunk-skipping at depth: windowed decode cost should
    stay flat as context grows while full-attention cost grows.

Batch is small (8) — the long-context serving regime — which also routes
decode through the multi-sequence-per-program kernel variant (the
reference paged_attention_v2 partitioned-kernel role,
vllm/attention/ops/paged_attn.py:111-121).

Usage: python benchmarks/longctx_bench.py [--leg full|window]
Prints one JSON line per (leg, ctx).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

BATCH = int(os.environ.get("LONGCTX_BATCH", "8"))
CTXS = tuple(int(c) for c in os.environ.get(
    "LONGCTX_CTXS", "1024,4096,8192").split(","))
WINDOW = 1024
SCHED_STEPS = 16
DISPATCHES = int(os.environ.get("LONGCTX_DISPATCHES", "4"))
CACHE = os.path.expanduser("~/.cache/nmv_tpu")


def build_engine(window):
    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              ModelConfig, ParallelConfig,
                                              SchedulerConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine

    max_len = max(CTXS) + 2 * SCHED_STEPS * DISPATCHES + 64
    hf_cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                         intermediate_size=14336, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=8,
                         max_position_embeddings=16384,
                         torch_dtype="bfloat16")
    hf_cfg.architectures = ["LlamaForCausalLM"]
    if window:
        hf_cfg.sliding_window = WINDOW
    state_dir = os.path.join(CACHE, "llama3-8b-w4a16")
    if not os.path.isdir(os.path.join(state_dir, "nmv_state")):
        sys.exit("run bench.py first to create the cached 8B W4A16 state")
    engine_config = EngineConfig(
        model_config=ModelConfig(model=state_dir, dtype="bfloat16",
                                 max_model_len=max_len, hf_config=hf_cfg,
                                 quantization="gptq",
                                 skip_tokenizer_init=True),
        cache_config=CacheConfig(
            block_size=16, hbm_utilization=0.9,
            num_gpu_blocks_override=BATCH * (max_len + 16) // 16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=BATCH, max_model_len=max_len,
            max_num_batched_tokens=max_len,
            num_scheduler_steps=SCHED_STEPS),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="nmv"),
    )
    return LLMEngine(engine_config, log_stats=False)


def run_leg(leg):
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    engine = build_engine(leg == "window")
    rng = np.random.default_rng(0)
    records = []
    for ctx in CTXS:
        prompt_len = ctx - 8
        max_new = (DISPATCHES + 2) * SCHED_STEPS
        sp = SamplingParams(temperature=0.0, max_tokens=max_new,
                            ignore_eos=True, detokenize=False)
        # warm the prefill executable for this bucket with ONE request,
        # then time a second identical prefill = steady-state TTFT
        pfx = f"c{ctx}-"
        engine.add_request(pfx + "warm",
                           prompt_token_ids=rng.integers(
                               1, 128256, prompt_len).tolist(),
                           sampling_params=sp)
        while engine.scheduler.waiting:
            engine.step()
        engine.add_request(pfx + "timed",
                           prompt_token_ids=rng.integers(
                               1, 128256, prompt_len).tolist(),
                           sampling_params=sp)
        t0 = time.perf_counter()
        while engine.scheduler.waiting:
            engine.step()
        ttft_ms = (time.perf_counter() - t0) * 1000
        for i in range(BATCH - 2):
            engine.add_request(pfx + str(i),
                               prompt_token_ids=rng.integers(
                                   1, 128256, prompt_len).tolist(),
                               sampling_params=sp)
        while engine.scheduler.waiting or engine.scheduler.swapped:
            engine.step()
        engine.step()  # warm fused-decode dispatch at this depth
        t0 = time.perf_counter()
        n = 0
        while n < DISPATCHES and engine.has_unfinished_requests():
            engine.step()
            n += 1
        dt = time.perf_counter() - t0
        ms_step = dt / n / SCHED_STEPS * 1000
        records.append({
            "leg": leg, "ctx": ctx, "batch": BATCH,
            "prefill_ttft_ms": round(ttft_ms, 1),
            "decode_ms_per_step": round(ms_step, 2),
            "decode_tokens_per_s": round(BATCH / (ms_step / 1000), 1),
            "window": WINDOW if leg == "window" else None,
        })
        # free all blocks before the next depth
        engine.abort_request([pfx + "warm", pfx + "timed"] +
                             [pfx + str(i) for i in range(BATCH - 2)])
    return records


def main():
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        for rec in run_leg(leg):
            print(json.dumps(rec), flush=True)
        return
    env = dict(os.environ)
    for leg in ("full", "window"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            env=env, capture_output=True, text=True)
        printed = False
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                printed = True
        if not printed:
            print(json.dumps({"leg": leg,
                              "error": out.stderr.splitlines()[-3:]}),
                  flush=True)


if __name__ == "__main__":
    main()
