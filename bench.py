"""Benchmark: Llama-3-8B-architecture W4A16 (GPTQ, group 128) greedy decode
on one chip — BASELINE.json config 2 ("Llama-3-8B GPTQ/Marlin W4A16
weight-only, continuous batching, 1 chip"), through the full engine
(scheduler + bucketed runner + fused multi-step decode + Pallas fused
dequant-GEMM), measuring steady-state decode tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = fraction of the weight-streaming speed-of-light for the
QUANTIZED model on this chip: every decode step must read all packed weights
once from HBM (batch rows amortize); SOL steps/s = HBM_BW / step_bytes.
(The reference publishes no absolute tokens/s — BASELINE.md — so SOL is the
recorded denominator, matching the north star "decode at speed-of-light
dequant-GEMM".)

Env overrides: BENCH_MODEL=tinyllama switches to the round-0 TinyLlama bf16
config for apples-to-apples history.
"""
import json
import os
import statistics
import re
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
    # honor the env var explicitly so CPU smoke runs work (see
    # tests/conftest.py for the same dance).
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODEL = os.environ.get("BENCH_MODEL", "llama3-8b-w4a16")
# 512 is the measured sweet spot (PERF.md round-2 matrix): the dequant-GEMM
# tile_m=256 lattice pads 384 to 512 anyway, and 512 amortizes the per-op
# floor best while still fitting HBM at this prompt/decode budget.
BATCH = int(os.environ.get("BENCH_BATCH", "512"))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT_LEN", "64"))
DECODE_STEPS = int(os.environ.get("BENCH_DECODE_STEPS", "96"))
HBM_BW_GBS = float(os.environ.get("BENCH_HBM_BW_GBS", "819"))
MXU_TFLOPS = float(os.environ.get("BENCH_MXU_TFLOPS", "197"))  # v5e bf16
FLOPS_PER_TOKEN = 1.0  # set by build_engine per model
SCHED_STEPS = int(os.environ.get("BENCH_SCHEDULER_STEPS", "16"))
KV_DTYPE = os.environ.get("BENCH_KV_DTYPE", "auto")
CHUNKED_PREFILL = bool(int(os.environ.get("BENCH_CHUNKED_PREFILL", "0")))
BATCHED_TOKENS = int(os.environ.get("BENCH_BATCHED_TOKENS", "2048"))


def build_engine():
    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              ModelConfig, ParallelConfig,
                                              SchedulerConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine

    global FLOPS_PER_TOKEN, DECODE_STEPS, BATCH
    if MODEL == "micro":
        # CI/CPU smoke config: exercises the bench mechanics only.
        hf_cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             max_position_embeddings=2048,
                             torch_dtype="float32")
        quant = None
        metric = f"decode_tokens_per_s_micro_bs{BATCH}"
        lin_params = 2 * (64 * (64 + 2 * 32 + 64) + 3 * 64 * 128)
        wbytes = 4 * (256 * 64 * 2 + lin_params)
        FLOPS_PER_TOKEN = 2.0 * (lin_params + 256 * 64)
    elif MODEL == "tinyllama":
        hf_cfg = LlamaConfig(vocab_size=32000, hidden_size=2048,
                             intermediate_size=5632, num_hidden_layers=22,
                             num_attention_heads=32, num_key_value_heads=4,
                             max_position_embeddings=2048,
                             torch_dtype="bfloat16")
        quant = None
        metric = f"decode_tokens_per_s_tinyllama1.1b_bf16_bs{BATCH}"
        # bf16: 2 bytes/weight
        lin_params = 22 * (2048 * (2048 + 2 * 256 + 2048) +
                           3 * 2048 * 5632)
        wbytes = 2 * (32000 * 2048 * 2 + lin_params)
        FLOPS_PER_TOKEN = 2.0 * (lin_params + 32000 * 2048)
    elif MODEL == "mixtral-scaled-w4a16":
        # Scaled Mixtral architecture (BASELINE config 4's on-chip stand-in:
        # 8x7B does not fit one 16 GiB chip, so 8 experts at ~1/8 scale
        # validates + benches the grouped-GEMM MoE path on silicon —
        # VERDICT r2 missing #1). Same routing (top-2 of 8), same
        # WNA16-packed expert stacks as a real W4A16 Mixtral checkpoint.
        from transformers import MixtralConfig
        hf_cfg = MixtralConfig(vocab_size=32000, hidden_size=2048,
                               intermediate_size=4096, num_hidden_layers=16,
                               num_attention_heads=16, num_key_value_heads=4,
                               num_local_experts=8, num_experts_per_tok=2,
                               max_position_embeddings=4096,
                               torch_dtype="bfloat16")
        hf_cfg.architectures = ["MixtralForCausalLM"]
        quant = "gptq"
        metric = f"decode_tokens_per_s_mixtral-scaled_w4a16_bs{BATCH}"
        attn = 16 * 2048 * (2048 + 2 * 512 + 2048)
        experts_all = 16 * 8 * 3 * 2048 * 4096
        # weight-stream: every step reads ALL packed experts (at decode
        # batch >= ~64, top-2 routing touches every expert) + attn + embeds
        wbytes = int((attn + experts_all) * 0.5) + 2 * (32000 * 2048 * 2)
        # compute: only top_k of E experts run per token
        FLOPS_PER_TOKEN = 2.0 * (attn + experts_all * 2 // 8 +
                                 32000 * 2048)
    else:
        # Llama-3-8B architecture; BENCH_MODEL=llama3-8b-fp8 switches the
        # linears to FP8 W8A8 (the reference's second headline config)
        hf_cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                             intermediate_size=14336, num_hidden_layers=32,
                             num_attention_heads=32, num_key_value_heads=8,
                             max_position_embeddings=8192,
                             torch_dtype="bfloat16")
        per_layer = 4096 * (4096 + 2 * 1024 + 4096) + 3 * 4096 * 14336
        if MODEL == "llama3-8b-fp8":
            quant = "fp8"
            metric = (f"decode_tokens_per_s_llama3-8b_fp8w8a8_bs{BATCH}" +
                      ("_fp8kv" if KV_DTYPE.startswith("fp8") else ""))
            # fp8 linears (1 B/weight) + bf16 embed & lm_head
            wbytes = 32 * per_layer + 2 * (128256 * 4096 * 2)
        else:
            quant = "gptq"
            metric = (f"decode_tokens_per_s_llama3-8b_w4a16_bs{BATCH}" +
                      ("_fp8kv" if KV_DTYPE.startswith("fp8") else ""))
            # packed int4 linears (0.5 B/weight) + bf16 embed & lm_head
            wbytes = int(32 * per_layer * 0.5) + 2 * (128256 * 4096 * 2)
        # decode matmul FLOPs/token: the full linear stack + bf16 lm_head
        FLOPS_PER_TOKEN = 2.0 * (32 * per_layer + 128256 * 4096)
    if not getattr(hf_cfg, "architectures", None):
        hf_cfg.architectures = ["LlamaForCausalLM"]

    # Fit the decode window to the chip's actual HBM: weights + the KV
    # override must leave headroom for activations/workspace. Without this
    # clamp bs512 x 96 steps allocates ~13 GiB of KV next to ~5.6 GiB of
    # weights and OOMs a 16 GiB chip during warmup.
    if "BENCH_DECODE_STEPS" not in os.environ and MODEL not in (
            "micro", "tinyllama"):
        import jax
        from neural_magic_vllm_tpu.utils import device_hbm_bytes
        dev = jax.devices()[0]
        hbm = device_hbm_bytes(dev) if jax.default_backend() in (
            "tpu", "axon") else None
        if hbm is not None:
            kv_elt = 1 if KV_DTYPE.startswith("fp8") else 2
            kvh, hd, layers = (hf_cfg.num_key_value_heads,
                               hf_cfg.hidden_size //
                               hf_cfg.num_attention_heads,
                               hf_cfg.num_hidden_layers)
            block_bytes = 16 * kvh * hd * 2 * kv_elt * layers
            # bs384 x 208 tokens/seq (9.75 GiB KV + 5.45 GiB weights)
            # measured OK on a 16 GiB chip (PERF.md round-2 matrix), so
            # ~800 MiB of activation headroom is the demonstrated margin.
            headroom = (800 << 20)
            usable = int(hbm * 0.97) - wbytes - headroom
            fit_blocks = max(usable // block_bytes, 0)

            def raw_steps(batch):
                return (fit_blocks * 16 // batch - PROMPT_LEN -
                        SCHED_STEPS - 32)

            # If even a 2-dispatch window can't fit at this batch (e.g.
            # fp8's 9.1 GiB of weights), shrink the batch first.
            if "BENCH_BATCH" not in os.environ:
                while BATCH > 128 and raw_steps(BATCH) < 2 * SCHED_STEPS:
                    BATCH -= 128
                    print(f"bench: shrinking batch to {BATCH} to fit "
                          f"{hbm / 2**30:.1f} GiB HBM", file=sys.stderr)
            fit_steps = max(SCHED_STEPS,
                            (raw_steps(BATCH) // SCHED_STEPS) *
                            SCHED_STEPS)
            if fit_steps < DECODE_STEPS:
                print(f"bench: clamping decode window {DECODE_STEPS} -> "
                      f"{fit_steps} steps to fit "
                      f"{hbm / 2**30:.1f} GiB HBM", file=sys.stderr)
                DECODE_STEPS = fit_steps
            metric = re.sub(r"_bs\d+", f"_bs{BATCH}", metric)

    # Cache the packed dummy checkpoint on disk: init_params + quant
    # packing for 8B costs ~5 min; the orbax reload ~30 s. Weights are
    # seed-deterministic either way, so the numbers are identical.
    state_dir = os.environ.get(
        "BENCH_STATE_DIR", os.path.expanduser(f"~/.cache/nmv_tpu/{MODEL}"))
    save_state = False
    load_format = "dummy"
    model_path = f"{MODEL}-bench"
    if state_dir:
        if os.path.isdir(os.path.join(state_dir, "nmv_state")):
            load_format = "nmv"
            model_path = state_dir
        else:
            save_state = True

    model_config = ModelConfig(model=model_path, dtype="bfloat16",
                               max_model_len=1024, hf_config=hf_cfg,
                               quantization=quant, skip_tokenizer_init=True)
    engine_config = EngineConfig(
        model_config=model_config,
        cache_config=CacheConfig(block_size=16, hbm_utilization=0.9,
                                 cache_dtype=KV_DTYPE,
                                 num_gpu_blocks_override=BATCH *
                                 (PROMPT_LEN + DECODE_STEPS +
                                  SCHED_STEPS + 32) // 16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=max(BATCH, 8), max_model_len=1024,
            max_num_batched_tokens=BATCHED_TOKENS,  # default: 32 prompts
                                                    # per prefill dispatch
            enable_chunked_prefill=CHUNKED_PREFILL,
            num_scheduler_steps=SCHED_STEPS),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format=load_format),
    )
    engine = LLMEngine(engine_config, log_stats=False)
    if save_state:
        os.makedirs(state_dir, exist_ok=True)
        engine.model_executor.save_state(state_dir)
    return engine, metric, wbytes


def _timed_decode_window(engine, batch: int, prompt_len: int,
                         decode_steps: int, req_prefix: str) -> float:
    """Prefill `batch` fresh requests, run one warm fused dispatch, then
    time a steady-state decode window. Returns tokens/s."""
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    vocab = engine.model_config.get_vocab_size()
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0,
                        max_tokens=decode_steps + SCHED_STEPS,
                        ignore_eos=True, detokenize=False)
    for i in range(batch):
        ids = rng.integers(1, vocab, size=prompt_len).tolist()
        engine.add_request(req_prefix + str(i), prompt_token_ids=ids,
                           sampling_params=sp)

    # Phase 1: prefill every sequence (compile + prefill excluded from the
    # timed region). Phase 2: one warm fused-decode dispatch. Phase 3:
    # timed steady-state decode.
    sched = engine.scheduler
    while sched.waiting or sched.swapped:
        engine.step()
    engine.step()  # one warm fused-decode dispatch

    t0 = time.perf_counter()
    steps = 0
    while steps < decode_steps and engine.has_unfinished_requests():
        engine.step()
        steps += SCHED_STEPS
    dt = time.perf_counter() - t0
    # drain: free blocks for any follow-up measurement on the same engine
    engine.abort_request([req_prefix + str(i) for i in range(batch)])
    return batch * steps / dt


def main():
    engine, metric, wbytes = build_engine()

    # Best of N independently-prefilled windows: the HBM clamp leaves only
    # ~2 fused dispatches per window at bs512, and the tunneled device's
    # per-dispatch time swings +-10% run to run (round-4 diagnosis of the
    # round-3 "bs512 regression" — BENCH history 3338 -> 2963 -> 3390 at
    # identical code/config). The best window is the least-perturbed
    # sample of the same steady state.
    windows = int(os.environ.get("BENCH_WINDOWS", "2"))
    samples = [_timed_decode_window(engine, BATCH, PROMPT_LEN,
                                    DECODE_STEPS, f"m{w}-")
               for w in range(windows)]
    # Headline = MEDIAN of the windows (advisor r4: max() biased the
    # figure up and broke comparability with earlier fixed-config rows).
    # All samples are still recorded in window_samples; best_window is
    # kept as a separate, clearly-labeled field.
    tok_per_s = statistics.median(samples)

    # Speed of light = the binding roofline. Weight-stream: every decode
    # step reads all packed weights once (batch rows amortize). Compute:
    # the MXU must push 2*active-params FLOPs per token regardless of
    # batch, so past ~bs128 W4A16 decode is MXU-bound, not BW-bound.
    # BOTH ratios are emitted (vs_bw_sol, vs_min_sol) so cross-round
    # comparisons stay honest by construction; vs_baseline == vs_min_sol.
    def ratios(batch, tps):
        sol_bw = HBM_BW_GBS * 1e9 / wbytes * batch
        sol_mxu = MXU_TFLOPS * 1e12 / FLOPS_PER_TOKEN
        return (round(tps / sol_bw, 4), round(tps / min(sol_bw, sol_mxu), 4))

    vs_bw, vs_min = ratios(BATCH, tok_per_s)
    record = {
        "metric": metric,
        "value": round(tok_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": vs_min,
        "vs_bw_sol": vs_bw,
        "vs_min_sol": vs_min,
        "decode_window_steps": DECODE_STEPS,
        "fused_steps": SCHED_STEPS,
        "window_samples": [round(s, 1) for s in samples],
        "best_window": round(max(samples), 1),
    }

    # Fixed-config history row (bs256, prompt 64, fused-16, 64-step
    # window): ONE number comparable across rounds regardless of where
    # the headline sweet spot moves. Measured on the same engine (bucket
    # 256 is in the lattice whenever max_num_seqs >= 256).
    if MODEL not in ("micro", "tinyllama") and BATCH != 256 and \
            engine.scheduler_config.max_num_seqs >= 256 and \
            "BENCH_SKIP_HISTORY" not in os.environ:
        hist_tps = _timed_decode_window(engine, 256, 64,
                                        min(64, DECODE_STEPS), "h")
        record["bs256_tokens_per_s"] = round(hist_tps, 2)
        record["bs256_vs_bw_sol"], record["bs256_vs_min_sol"] = \
            ratios(256, hist_tps)
    elif BATCH == 256:
        record["bs256_tokens_per_s"] = record["value"]
        record["bs256_vs_bw_sol"], record["bs256_vs_min_sol"] = vs_bw, vs_min

    print(json.dumps(record))


if __name__ == "__main__":
    main()
