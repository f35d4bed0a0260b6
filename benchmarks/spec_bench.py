"""Speculative decoding on silicon (VERDICT r2 next-step #4).

Measures, on the real chip, for the 8B W4A16 bench target:
  - plain decode ms/dispatch at K=1 (the apples-to-apples baseline: one
    host round trip commits B tokens),
  - ngram (prompt-lookup) fused spec dispatch cost + measured acceptance,
  - draft-model fused spec dispatch cost (catch-up + k proposals + verify
    + in-graph rejection in ONE dispatch) + measured acceptance,
and derives the break-even acceptance rate
    alpha* = (T_spec / T_plain - 1) / k
above which spec decode beats plain decode at equal batch (tok/s =
B*(1+k*alpha)/T_spec vs B/T_plain).

Random bench weights give near-zero TRUE acceptance (a random-weight
target does not continue prompt repeats), so the acceptance MACHINERY is
validated by a separate leg: a small bf16 target whose draft is the SAME
checkpoint — greedy proposals then always match and measured acceptance
must be ~1.0 with k+1 tokens emitted per dispatch.

Reference anchors: vllm/spec_decode/spec_decode_worker.py:286 (the
multi-dispatch proposer/scorer/verify pipeline this replaces),
vllm/spec_decode/metrics.py (acceptance accounting).

Usage: python benchmarks/spec_bench.py [--leg all|plain|ngram|draft|accept]
Prints one JSON line per leg.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np

BATCH = int(os.environ.get("SPEC_BENCH_BATCH", "128"))
PROMPT_LEN = 64
K_SPEC = int(os.environ.get("SPEC_BENCH_K", "4"))
DISPATCHES = int(os.environ.get("SPEC_BENCH_DISPATCHES", "12"))
CACHE = os.path.expanduser("~/.cache/nmv_tpu")


def _draft_dir():
    """A small Llama-architecture draft sharing the 8B's 128256 vocab
    (head_dim 128 so every warmed kernel shape matches the target's)."""
    path = os.path.join(CACHE, "draft-llama-2048x4")
    if not os.path.isdir(path):
        from utils import create_tiny_llama_checkpoint
        create_tiny_llama_checkpoint(
            path, vocab_size=128256, hidden_size=2048,
            intermediate_size=5632, num_hidden_layers=4,
            num_attention_heads=16, num_key_value_heads=8,
            max_position_embeddings=2048, seed=11, dtype="bfloat16")
    return path


def build_engine(spec_kind, max_decode_tokens):
    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              ModelConfig, ParallelConfig,
                                              SchedulerConfig,
                                              SpeculativeConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
    from transformers import LlamaConfig

    hf_cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                         intermediate_size=14336, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=8,
                         max_position_embeddings=8192,
                         torch_dtype="bfloat16")
    hf_cfg.architectures = ["LlamaForCausalLM"]
    state_dir = os.path.join(CACHE, "llama3-8b-w4a16")
    if not os.path.isdir(os.path.join(state_dir, "nmv_state")):
        sys.exit("run bench.py first to create the cached 8B W4A16 state")
    spec = None
    if spec_kind == "ngram":
        spec = SpeculativeConfig(num_speculative_tokens=K_SPEC,
                                 ngram_prompt_lookup_max=4,
                                 ngram_prompt_lookup_min=2)
    elif spec_kind == "draft":
        spec = SpeculativeConfig(num_speculative_tokens=K_SPEC,
                                 speculative_model=_draft_dir())
    engine_config = EngineConfig(
        model_config=ModelConfig(model=state_dir, dtype="bfloat16",
                                 max_model_len=1024, hf_config=hf_cfg,
                                 quantization="gptq",
                                 skip_tokenizer_init=True),
        cache_config=CacheConfig(
            block_size=16, hbm_utilization=0.9,
            num_gpu_blocks_override=BATCH *
            (PROMPT_LEN + max_decode_tokens + 48) // 16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=BATCH, max_model_len=1024,
            max_num_batched_tokens=2048,
            num_lookahead_slots=K_SPEC if spec is not None else 0,
            num_scheduler_steps=1),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="nmv"),
        speculative_config=spec,
    )
    return LLMEngine(engine_config, log_stats=False)


def run_leg(leg):
    from neural_magic_vllm_tpu.sampling_params import SamplingParams
    max_new = DISPATCHES * (K_SPEC + 1) + 2 * (K_SPEC + 1)
    base_leg = leg.replace("-t1", "")
    engine = build_engine(base_leg if base_leg in ("ngram", "draft")
                          else None, max_new)
    vocab = 128256
    rng = np.random.default_rng(0)
    # "-t1" legs: temperature 1 with a seed — the IN-GRAPH stochastic
    # rejection path (VERDICT r4 #4); plain legs stay greedy
    temp = 1.0 if leg.endswith("-t1") else 0.0
    sp = SamplingParams(temperature=temp, seed=7 if temp else None,
                        max_tokens=max_new,
                        ignore_eos=True, detokenize=False)
    for i in range(BATCH):
        # repetitive tail: gives the ngram proposer matches to propose
        # (whether the target accepts them is what's being measured)
        base = rng.integers(1, vocab, size=8).tolist()
        ids = (base * ((PROMPT_LEN + 7) // 8))[:PROMPT_LEN]
        engine.add_request(str(i), prompt_token_ids=ids,
                           sampling_params=sp)
    sched = engine.scheduler
    while sched.waiting or sched.swapped:
        engine.step()
    engine.step()
    engine.step()  # two warm dispatches (compile + steady)

    runner = engine.model_executor.driver_worker.model_runner
    m0 = None
    if getattr(runner, "_spec_metrics", None) is not None:
        sm = runner._spec_metrics
        m0 = (sm.num_steps, sm.num_spec_tokens, sm.accepted_tokens,
              sm.emitted_tokens)

    out0 = _total_output_tokens(engine)
    t0 = time.perf_counter()
    n = 0
    while n < DISPATCHES and engine.has_unfinished_requests():
        engine.step()
        n += 1
    dt = time.perf_counter() - t0
    emitted = _total_output_tokens(engine) - out0

    rec = {
        "leg": leg, "batch": BATCH,
        "k": K_SPEC if base_leg != "plain" else 0,
        "dispatches": n,
        "ms_per_dispatch": round(dt / n * 1000, 2),
        "tokens_per_s": round(emitted / dt, 1),
        "tokens_per_dispatch_per_seq": round(emitted / n / BATCH, 3),
    }
    if m0 is not None:
        sm = runner._spec_metrics
        d_spec = sm.num_spec_tokens - m0[1]
        d_acc = sm.accepted_tokens - m0[2]
        rec["acceptance"] = round(d_acc / d_spec, 4) if d_spec else 0.0
    return rec


def _total_output_tokens(engine):
    total = 0
    for group in engine.scheduler.running:
        for seq in group.get_seqs():
            total += seq.get_output_len()
    return total


def run_accept_leg():
    """Acceptance-machinery validation: small bf16 target whose draft is
    the SAME checkpoint -> greedy proposals always match (alpha ~= 1)."""
    from neural_magic_vllm_tpu import LLM, SamplingParams
    path = _draft_dir()
    llm = LLM(model=path, dtype="bfloat16", max_model_len=512,
              block_size=16, max_num_seqs=32,
              num_gpu_blocks_override=32 * 16,
              speculative_model=path, num_speculative_tokens=K_SPEC,
              disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True,
                        detokenize=False)
    prompts = [[1 + (i * 7 + j) % 1000 for j in range(32)]
               for i in range(32)]
    t0 = time.perf_counter()
    llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                 use_tqdm=False)
    dt = time.perf_counter() - t0
    runner = llm.llm_engine.model_executor.driver_worker.model_runner
    sm = runner._spec_metrics
    return {
        "leg": "accept-validation (draft==target)", "batch": 32,
        "k": K_SPEC,
        "acceptance": round(sm.accepted_tokens / max(sm.num_spec_tokens, 1),
                            4),
        "emitted_per_step_per_seq": round(
            sm.emitted_tokens / max(sm.num_steps, 1) / 32, 3),
        "wall_s": round(dt, 1),
    }


def main():
    want = sys.argv[sys.argv.index("--leg") + 1] if "--leg" in sys.argv \
        else "all"
    if want == "all":
        # one leg per process: two engines' weights+KV do not fit HBM
        # side by side, and device buffers outlive an engine object
        import subprocess
        env = dict(os.environ)
        t_plain = None
        for leg in ("plain", "ngram", "ngram-t1", "draft", "accept"):
            if t_plain:
                env["SPEC_BENCH_T_PLAIN"] = str(t_plain)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", leg],
                env=env, capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if not line:
                print(json.dumps({"leg": leg, "error":
                                  out.stderr.splitlines()[-3:]}),
                      flush=True)
                continue
            rec = json.loads(line[-1])
            if leg == "plain":
                t_plain = rec["ms_per_dispatch"]
            print(line[-1], flush=True)
        return
    if want == "accept":
        print(json.dumps(run_accept_leg()), flush=True)
        return
    rec = run_leg(want)
    t_plain = os.environ.get("SPEC_BENCH_T_PLAIN")
    if want != "plain" and t_plain:
        rec["break_even_acceptance"] = round(
            (rec["ms_per_dispatch"] / float(t_plain) - 1) / K_SPEC, 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
