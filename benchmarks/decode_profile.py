"""Per-phase decode-step decomposition on the real chip.

Runs the bench engine (bench.py config) and times the steady-state fused
decode dispatch under the current config; with
NMV_TPU_ATTENTION_BACKEND=null the attention cost drops out, so
  attention ~= T(default) - T(null)
and NMV_TPU_QUANT_BACKEND=ref measures the fused dequant-GEMM gain.

Usage: python benchmarks/decode_profile.py            # one timing
       BENCH_BATCH=384 BENCH_KV_DTYPE=fp8 python ...  # variants
Prints one JSON line with ms/decode-step and tokens/s.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    engine, metric, wbytes = bench.build_engine()
    vocab = engine.model_config.get_vocab_size()
    B, K = bench.BATCH, bench.SCHED_STEPS
    steps_total = bench.DECODE_STEPS

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=steps_total + K,
                        ignore_eos=True, detokenize=False)
    for i in range(B):
        ids = rng.integers(1, vocab, size=bench.PROMPT_LEN).tolist()
        engine.add_request(str(i), prompt_token_ids=ids,
                           sampling_params=sp)
    t0 = time.perf_counter()
    sched = engine.scheduler
    n_prefill_steps = 0
    while sched.waiting or sched.swapped:
        engine.step()
        n_prefill_steps += 1
    t_prefill = time.perf_counter() - t0
    engine.step()  # warm fused-decode dispatch

    t0 = time.perf_counter()
    steps = 0
    dispatches = 0
    while steps < steps_total and engine.has_unfinished_requests():
        engine.step()
        steps += K
        dispatches += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "attn": os.environ.get("NMV_TPU_ATTENTION_BACKEND", "default"),
        "quant": os.environ.get("NMV_TPU_QUANT_BACKEND", "default"),
        "batch": B, "sched_steps": K,
        "kv_dtype": os.environ.get("BENCH_KV_DTYPE", "auto"),
        "ms_per_decode_step": round(dt / steps * 1000, 2),
        "ms_per_dispatch": round(dt / dispatches * 1000, 1),
        "tokens_per_s": round(B * steps / dt, 1),
        "prefill_s": round(t_prefill, 1),
        "prefill_steps": n_prefill_steps,
    }))


if __name__ == "__main__":
    main()
