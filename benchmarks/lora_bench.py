"""Multi-LoRA serving cost on silicon (VERDICT r3 ask #5).

Measures, on the real chip for the 8B W4A16 bench target, the fused-decode
dispatch cost with S active adapter slots for BOTH apply formulations
(all-slots einsum vs grouped ragged_dot, lora/layers.py), plus the
adapter-off baseline, and derives the dense->grouped crossover from data
instead of the guessed S>8 default.

Reference anchor: csrc/punica/bgmv/bgmv_impl.cuh (the O(1)-in-S batched
GEMV contract being matched).

Usage: python benchmarks/lora_bench.py [--leg off|1|8|32]
(default: all legs, one engine per process — weights+KV don't fit twice).
Prints one JSON line per leg.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

BATCH = int(os.environ.get("LORA_BENCH_BATCH", "256"))
PROMPT_LEN = 64
RANK = 8
ALPHA = 16.0
SCHED_STEPS = 16
DISPATCHES = int(os.environ.get("LORA_BENCH_DISPATCHES", "3"))
CACHE = os.path.expanduser("~/.cache/nmv_tpu")
TARGETS = ("q_proj", "v_proj", "gate_proj")


def _adapter_dir():
    """One synthetic peft adapter with real Llama-3-8B shapes; S slots all
    load this directory under distinct LoRA ids (the cost being measured
    is slot count, not adapter content)."""
    path = os.path.join(CACHE, f"lora-8b-r{RANK}")
    if os.path.isdir(path):
        return path
    from safetensors.numpy import save_file
    rng = np.random.default_rng(5)
    shapes = {"q_proj": (4096, 4096), "v_proj": (1024, 4096),
              "gate_proj": (14336, 4096)}
    tensors = {}
    for layer in range(32):
        for t in TARGETS:
            out_d, in_d = shapes[t]
            base = f"base_model.model.model.layers.{layer}.self_attn.{t}" \
                if t in ("q_proj", "v_proj") else \
                f"base_model.model.model.layers.{layer}.mlp.{t}"
            tensors[base + ".lora_A.weight"] = (
                rng.standard_normal((RANK, in_d)) * 0.002).astype(np.float32)
            tensors[base + ".lora_B.weight"] = (
                rng.standard_normal((out_d, RANK)) * 0.002).astype(
                    np.float32)
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": list(TARGETS), "peft_type": "LORA"}, f)
    return path


def build_engine(max_loras):
    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              LoRAConfig, ModelConfig,
                                              ParallelConfig,
                                              SchedulerConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine

    hf_cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                         intermediate_size=14336, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=8,
                         max_position_embeddings=8192,
                         torch_dtype="bfloat16")
    hf_cfg.architectures = ["LlamaForCausalLM"]
    state_dir = os.path.join(CACHE, "llama3-8b-w4a16")
    if not os.path.isdir(os.path.join(state_dir, "nmv_state")):
        sys.exit("run bench.py first to create the cached 8B W4A16 state")
    lora_cfg = None
    if max_loras:
        lora_cfg = LoRAConfig(max_lora_rank=RANK, max_loras=max_loras)
    engine_config = EngineConfig(
        model_config=ModelConfig(model=state_dir, dtype="bfloat16",
                                 max_model_len=1024, hf_config=hf_cfg,
                                 quantization="gptq",
                                 skip_tokenizer_init=True),
        cache_config=CacheConfig(
            block_size=16, hbm_utilization=0.9,
            num_gpu_blocks_override=BATCH *
            (PROMPT_LEN + DISPATCHES * SCHED_STEPS + 2 * SCHED_STEPS + 32)
            // 16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=BATCH, max_model_len=1024,
            max_num_batched_tokens=2048,
            num_scheduler_steps=SCHED_STEPS),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="nmv"),
        lora_config=lora_cfg,
    )
    return LLMEngine(engine_config, log_stats=False)


def _measure(engine, n_slots, req_prefix):
    """Prefill BATCH requests round-robin across n_slots adapters (0 =
    no adapter), one warm dispatch, then timed fused-decode dispatches."""
    from neural_magic_vllm_tpu.lora import LoRARequest
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    adir = _adapter_dir() if n_slots else None
    max_new = (DISPATCHES + 2) * SCHED_STEPS
    sp = SamplingParams(temperature=0.0, max_tokens=max_new,
                        ignore_eos=True, detokenize=False)
    rng = np.random.default_rng(0)
    for i in range(BATCH):
        lr = LoRARequest(f"a{i % n_slots + 1}", i % n_slots + 1, adir) \
            if n_slots else None
        ids = rng.integers(1, 128256, size=PROMPT_LEN).tolist()
        engine.add_request(req_prefix + str(i), prompt_token_ids=ids,
                           sampling_params=sp, lora_request=lr)
    sched = engine.scheduler
    while sched.waiting or sched.swapped:
        engine.step()
    engine.step()  # warm fused dispatch (compile excluded)

    t0 = time.perf_counter()
    n = 0
    while n < DISPATCHES and engine.has_unfinished_requests():
        engine.step()
        n += 1
    dt = time.perf_counter() - t0
    engine.abort_request([req_prefix + str(i) for i in range(BATCH)])
    return dt / n * 1000 / SCHED_STEPS  # ms per decode step


def run_leg(leg):
    if leg == "off":
        engine = build_engine(0)
        ms = _measure(engine, 0, "m")
        return {"leg": "lora-off", "batch": BATCH,
                "ms_per_step": round(ms, 2)}
    S = int(leg)
    engine = build_engine(S)
    rec = {"leg": f"S={S}", "batch": BATCH, "rank": RANK}
    runner = engine.model_executor.driver_worker.model_runner
    # the all-slots dense apply is punica-unlike at dozens of slots by
    # design (lora/layers.py): at S=32 its prefill intermediates exceed
    # HBM (XLA compile measured 22.5 GiB) — measure grouped only there
    modes = (("dense", "0"), ("grouped", "1")) if S <= 8 else \
        (("grouped", "1"), )
    for mode, flag in modes:
        os.environ["NMV_TPU_LORA_GROUPED"] = flag
        runner._fns.clear()  # re-trace with the other apply formulation
        ms = _measure(engine, S, f"{mode[0]}-")
        rec[f"ms_per_step_{mode}"] = round(ms, 2)
    return rec


def main():
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        print(json.dumps(run_leg(leg)), flush=True)
        return
    _adapter_dir()
    env = dict(os.environ)
    for leg in ("off", "1", "8", "32"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            env=env, capture_output=True, text=True)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            print(json.dumps({"leg": leg,
                              "error": out.stderr.splitlines()[-3:]}),
                  flush=True)


if __name__ == "__main__":
    main()
