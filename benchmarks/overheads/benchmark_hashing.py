"""Prefix-cache hashing overhead (role of reference
benchmarks/overheads/benchmark_hashing.py): profiles how much host time
the per-block content hashing costs on a long prompt with prefix caching
enabled. On TPU the host must stay under the device step time, so block
hashing is on the latency-critical path.

Usage: python benchmarks/overheads/benchmark_hashing.py [--model DIR]
(defaults to the tiny offline checkpoint on the CPU backend)
"""
import argparse
import cProfile
import os
import pstats
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--prompt-len", type=int, default=1500)
    parser.add_argument("--output-len", type=int, default=8)
    args = parser.parse_args()

    if args.model is None:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from utils import create_tiny_llama_checkpoint
        args.model = "/tmp/nmv-hashing-bench-model"
        create_tiny_llama_checkpoint(args.model)
        args.dtype = "float32"

    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.prompt_len + args.output_len + 16,
              enable_prefix_caching=True, enforce_eager=True)
    vocab = llm.llm_engine.model_config.get_vocab_size()

    import numpy as np
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, vocab, size=args.prompt_len).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len)

    llm.generate(prompt_token_ids=[prompt], sampling_params=sp,
                 use_tqdm=False)  # warm

    import time
    profiler = cProfile.Profile()
    t0 = time.perf_counter()
    for _ in range(3):
        profiler.runctx(
            "llm.generate(prompt_token_ids=[prompt], sampling_params=sp,"
            " use_tqdm=False)", globals(), locals())
    total_time = time.perf_counter() - t0

    stats = pstats.Stats(profiler)
    hash_time = 0.0
    for (fn_file, _, fn_name), stat in stats.stats.items():
        if "hash" in fn_name and ("sequence" in fn_file
                                  or "block_manager" in fn_file):
            hash_time += stat[3]  # cumulative seconds
    print(f"total generate time : {total_time:.4f}s (3 runs)")
    print(f"block hashing time  : {hash_time:.4f}s "
          f"({100 * hash_time / max(total_time, 1e-9):.2f}%)")


if __name__ == "__main__":
    main()
