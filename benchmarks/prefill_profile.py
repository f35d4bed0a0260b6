"""Prefill characterization on the real chip (VERDICT weak-2: TTFT
decomposition + bucket-lattice compile cost at serving fidelity).

Measures, per prefill token bucket: first-dispatch time (compile+run) and
steady-state dispatch latency (median of N warm runs, each a fresh request
through the real engine.step() path), plus the ragged batched-prefill
dispatch (many prompts packed into one weight pass). Prints one JSON line
per measurement.

Usage: python benchmarks/prefill_profile.py          # bench-config engine
       BENCH_BATCH=64 python benchmarks/prefill_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

WARM_RUNS = 5


def _drain(engine):
    while engine.has_unfinished_requests():
        engine.step()


def main():
    import bench
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    engine, _, _ = bench.build_engine()
    vocab = engine.model_config.get_vocab_size()
    sched_cfg = engine.scheduler.scheduler_config
    buckets = sched_cfg.prefill_buckets()
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True,
                        detokenize=False)
    rid = 0

    def one_prefill(prompt_len):
        """TTFT: step until the request emits its first token (one
        dispatch normally; several under chunked prefill)."""
        nonlocal rid
        ids = rng.integers(1, vocab, size=prompt_len).tolist()
        engine.add_request(str(rid), prompt_token_ids=ids,
                           sampling_params=sp)
        rid += 1
        t0 = time.perf_counter()
        dt = None
        for _ in range(256):
            outs = engine.step()
            if any(o.outputs and o.outputs[0].token_ids for o in outs):
                dt = time.perf_counter() - t0
                break
        assert dt is not None, "request never produced a token"
        _drain(engine)
        return dt

    # single-sequence buckets are bounded by model len and KV capacity
    # (beyond that the engine ignores/rejects the request and the timing
    # would measure nothing)
    cache_cfg = engine.cache_config
    capacity = engine.cache_config.num_gpu_blocks * cache_cfg.block_size
    max_plen = min(sched_cfg.max_model_len - 1, capacity - 64)

    # under chunked prefill, long prompts span several budget-bounded
    # dispatches: sweep up to the model length, not just one bucket
    if sched_cfg.chunked_prefill_enabled:
        b = buckets[-1] * 2
        while b <= sched_cfg.max_model_len:
            buckets.append(b)
            b *= 2

    results = []
    for b in buckets:
        # prompt one shy of the bucket edge so padding targets bucket b
        plen = max(b - 1, 1)
        if plen > max_plen:
            print(json.dumps({"bucket": b, "skipped":
                              "exceeds model len or KV capacity"}),
                  flush=True)
            continue
        cold = one_prefill(plen)
        warm = sorted(one_prefill(plen) for _ in range(WARM_RUNS))
        med = warm[len(warm) // 2]
        results.append({
            "bucket": b, "cold_s": round(cold, 4),
            "steady_ms": round(med * 1e3, 2),
            "tok_per_s": round(plen / med, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    # ragged batched prefill: pack the step's token budget with prompts
    n = max(sched_cfg.max_num_batched_tokens // 64, 1)
    n = min(n, sched_cfg.max_num_seqs)

    def batched():
        nonlocal rid
        for _ in range(n):
            ids = rng.integers(1, vocab, size=63).tolist()
            engine.add_request(str(rid), prompt_token_ids=ids,
                               sampling_params=sp)
            rid += 1
        t0 = time.perf_counter()
        engine.step()
        dt = time.perf_counter() - t0
        _drain(engine)
        return dt

    cold = batched()
    warm = sorted(batched() for _ in range(WARM_RUNS))
    med = warm[len(warm) // 2]
    print(json.dumps({
        "bucket": "batched", "prompts": n, "cold_s": round(cold, 4),
        "steady_ms": round(med * 1e3, 2),
        "tok_per_s": round(n * 63 / med, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
