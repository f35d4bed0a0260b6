"""Guided-decoding serving overhead on silicon (VERDICT r3 ask #8).

Drives the 8B W4A16 bench engine at bs64 with a fraction of requests
carrying a REAL regex-FSM logits processor (the guided-decoding serving
path) and measures engine-level decode throughput:

  - f=0              : all-device fused-K baseline
  - f=1/16 device    : round-5 ON-DEVICE guided path — DFA tables in HBM,
                       guided rows ride the SAME fused-K dispatch
                       (decode_multi_guided; in-graph mask + advance)
  - f=1/16 host-mixed: round-4 behavior (majority fused-K, guided rows
                       run K host-sampled small-bucket steps alongside)
  - f=1/16 legacy    : pre-round-4 (one guided request drops the WHOLE
                       batch to single-step host sampling)
  - f=1/4 device     : heavier guided share on the device path

Reference anchor: outlines_logits_processors.py:30-148 (guided masks run
as per-step host logits processors inside the sampler for everyone).

Usage: python benchmarks/guided_bench.py   (one JSON line per leg)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

BATCH = int(os.environ.get("GUIDED_BENCH_BATCH", "64"))
PROMPT_LEN = 64
SCHED_STEPS = 16
DISPATCHES = int(os.environ.get("GUIDED_BENCH_DISPATCHES", "4"))
CACHE = os.path.expanduser("~/.cache/nmv_tpu")
PATTERN = r"\{\"value\": [0-9]{1,8}, \"name\": \"[a-z]{1,12}\"\}" + \
    r"( \{\"value\": [0-9]{1,8}, \"name\": \"[a-z]{1,12}\"\})*"


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
    state_dir = os.path.join(CACHE, "llama3-8b-w4a16")
    if not os.path.isdir(os.path.join(state_dir, "nmv_state")):
        sys.exit("run bench.py first to create the cached 8B W4A16 state")
    max_new = (DISPATCHES + 2) * SCHED_STEPS
    engine_config = EngineConfig(
        model_config=ModelConfig(model=state_dir, dtype="bfloat16",
                                 max_model_len=1024, hf_config=hf_cfg,
                                 quantization="gptq",
                                 skip_tokenizer_init=True),
        cache_config=CacheConfig(
            block_size=16, hbm_utilization=0.9,
            num_gpu_blocks_override=BATCH *
            (PROMPT_LEN + max_new + 48) // 16),
        parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(
            max_num_seqs=BATCH, max_model_len=1024,
            max_num_batched_tokens=2048,
            num_scheduler_steps=SCHED_STEPS),
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format="nmv"),
    )
    return LLMEngine(engine_config, log_stats=False)


def _tokenizer():
    serve_dir = os.path.join(CACHE, "llama3-8b-serve")
    if not os.path.isdir(serve_dir):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(REPO, "benchmarks",
                                     "prepare_serving_dir.py")], check=True)
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(serve_dir)


def _total_output_tokens(engine):
    total = 0
    for group in engine.scheduler.running:
        for seq in group.get_seqs():
            total += seq.get_output_len()
    return total


def run_leg(engine, tok, fsm, eos_id, guided_every, label):
    from neural_magic_vllm_tpu.guided_decoding import FSMLogitsProcessor
    from neural_magic_vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    max_new = (DISPATCHES + 2) * SCHED_STEPS
    n_guided = 0
    for i in range(BATCH):
        guided = guided_every and i % guided_every == 0
        procs = [FSMLogitsProcessor(fsm, eos_id)] if guided else []
        n_guided += bool(guided)
        sp = SamplingParams(temperature=0.0, max_tokens=max_new,
                            ignore_eos=True, detokenize=False,
                            logits_processors=procs)
        ids = rng.integers(1, 128256, size=PROMPT_LEN).tolist()
        engine.add_request(f"{label}-{i}", prompt_token_ids=ids,
                           sampling_params=sp)
    sched = engine.scheduler
    while sched.waiting or sched.swapped:
        engine.step()
    engine.step()  # warm dispatch (compile excluded)

    out0 = _total_output_tokens(engine)
    t0 = time.perf_counter()
    target = DISPATCHES * SCHED_STEPS * BATCH
    while _total_output_tokens(engine) - out0 < target and \
            engine.has_unfinished_requests():
        engine.step()
    dt = time.perf_counter() - t0
    emitted = _total_output_tokens(engine) - out0
    engine.abort_request([f"{label}-{i}" for i in range(BATCH)])
    runner = engine.model_executor.driver_worker.model_runner
    return {
        "leg": label, "batch": BATCH, "guided": n_guided,
        "device_kind_compiled": any(
            k[0] == "decode_multi_guided" for k in runner._fns),
        "mixed_fused": not bool(int(os.environ.get(
            "NMV_TPU_DISABLE_MIXED_FUSED", "0"))),
        "tokens_per_s": round(emitted / dt, 1),
        "ms_per_step_row": round(dt / (emitted / BATCH) * 1000, 2),
    }


def main():
    from neural_magic_vllm_tpu.guided_decoding import _get_fsm
    from neural_magic_vllm_tpu.guided_decoding.device_fsm import \
        build_device_fsm
    tok = _tokenizer()
    t0 = time.perf_counter()
    fsm = _get_fsm(PATTERN, tok)
    fsm_build_s = time.perf_counter() - t0
    # the bench engine runs skip_tokenizer_init (sgm.eos_token_id None),
    # so the processors and the device tables must carry eos None too or
    # the device-path eos consistency check declines every row; also
    # pre-build the tables synchronously so the measured dispatches are
    # never a host/device mix from the background build
    eos_id = None
    t0 = time.perf_counter()
    dfsm = build_device_fsm(fsm, 128256, eos_id)
    dfsm_build_s = time.perf_counter() - t0
    engine = build_engine()
    legs = [
        # (label, guided_every, DISABLE_MIXED_FUSED, GUIDED_DEVICE)
        ("all-device", 0, "0", "1"),
        ("guided-1of16-device", 16, "0", "1"),
        ("guided-1of16-host-mixed", 16, "0", "0"),
        ("guided-1of16-legacy", 16, "1", "0"),
        ("guided-1of4-device", 4, "0", "1"),
    ]
    print(json.dumps({"fsm_build_s": round(fsm_build_s, 2),
                      "device_fsm_build_s": round(dfsm_build_s, 2),
                      "device_fsm_states":
                      dfsm.n_states if dfsm else None,
                      "pattern": PATTERN}), flush=True)
    for label, every, disable, device in legs:
        os.environ["NMV_TPU_DISABLE_MIXED_FUSED"] = disable
        os.environ["NMV_TPU_GUIDED_DEVICE"] = device
        rec = run_leg(engine, tok, fsm, eos_id, every, label)
        rec["guided_device"] = device == "1"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
