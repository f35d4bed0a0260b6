"""Prefill roofline decomposition on silicon (VERDICT r4 #5): capture a
jax.profiler trace + per-executable HLO of the 8B W4A16 engine's
2048-token prefill bucket and one fused-16 decode dispatch, attribute
device time with tools/profile_table, and print the top modules with a
tokens/s + roofline summary.

Usage: python benchmarks/prefill_roofline.py  (needs the cached 8B state
from bench.py; writes /tmp/nmv_roofline/{prof,hlo} and prints the table)
"""
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROF = os.environ.get("ROOFLINE_PROF", "/tmp/nmv_roofline/prof")
HLO = os.environ.get("ROOFLINE_HLO", "/tmp/nmv_roofline/hlo")
os.environ["NMV_TPU_DUMP_HLO"] = HLO

import numpy as np


def build_engine():
    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, DeviceConfig,
                                              EngineConfig, LoadConfig,
                                              ModelConfig, ParallelConfig,
                                              SchedulerConfig)
    from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
    hf_cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                         intermediate_size=14336, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=8,
                         max_position_embeddings=8192,
                         torch_dtype="bfloat16")
    hf_cfg.architectures = ["LlamaForCausalLM"]
    state_dir = os.path.expanduser("~/.cache/nmv_tpu/llama3-8b-w4a16")
    if not os.path.isdir(os.path.join(state_dir, "nmv_state")):
        sys.exit("run bench.py first to create the cached 8B W4A16 state")
    B = 64
    cfg = EngineConfig(
        model_config=ModelConfig(model=state_dir, dtype="bfloat16",
                                 max_model_len=4096, hf_config=hf_cfg,
                                 quantization="gptq",
                                 skip_tokenizer_init=True),
        cache_config=CacheConfig(block_size=16, hbm_utilization=0.9,
                                 num_gpu_blocks_override=B * 160),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=B, max_model_len=4096,
            max_num_batched_tokens=2048, num_scheduler_steps=16),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="nmv"),
    )
    return LLMEngine(cfg, log_stats=False)


def main():
    import jax

    from neural_magic_vllm_tpu.sampling_params import SamplingParams
    engine = build_engine()
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True,
                        detokenize=False)
    # one 2048-token prompt (the serving prefill bucket) + decode rows
    engine.add_request("big", prompt_token_ids=rng.integers(
        1, 128256, size=2040).tolist(), sampling_params=sp)
    for i in range(48):
        engine.add_request(f"d{i}", prompt_token_ids=rng.integers(
            1, 128256, size=48).tolist(), sampling_params=sp)
    # drain prefills + a couple of warm decode windows (compiles excluded)
    sched = engine.scheduler
    while sched.waiting or sched.swapped:
        engine.step()
    engine.step()
    engine.step()

    # profiled region: one fresh 2048-token prefill + one fused window
    engine.add_request("big2", prompt_token_ids=rng.integers(
        1, 128256, size=2040).tolist(), sampling_params=sp)
    t0 = time.perf_counter()
    with jax.profiler.trace(PROF):
        steps = 0
        while steps < 3:
            engine.step()
            steps += 1
    wall = time.perf_counter() - t0
    print(json.dumps({"profiled_steps": 3, "wall_s": round(wall, 2)}))

    from tools.profile_table import analyze
    buf = io.StringIO()
    analyze(PROF, HLO, depth=3, top=8, out=buf)
    print(buf.getvalue())


if __name__ == "__main__":
    main()
