"""Prefix-caching benchmark (role of reference
benchmarks/benchmark_prefix_caching.py): N requests sharing one long
prompt prefix, timed with --enable-prefix-caching on vs off. With caching
on, every request after the first re-uses the prefix's KV blocks and only
computes the unique tail, so warm-batch latency should drop sharply.

Usage:
    python benchmarks/benchmark_prefix_caching.py --model <dir> \
        [--enable-prefix-caching] [--num-prompts 32] [--output-len 16]

Offline synthetic mode (no model dir): builds the tiny test checkpoint.
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
    # honor the env var explicitly (same dance as bench.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--num-prompts", type=int, default=32)
    parser.add_argument("--prefix-len", type=int, default=512,
                        help="shared prefix length in tokens")
    parser.add_argument("--unique-len", type=int, default=16)
    parser.add_argument("--output-len", type=int, default=16)
    parser.add_argument("--enable-prefix-caching", action="store_true")
    parser.add_argument("--max-model-len", type=int, default=1024)
    args = parser.parse_args()

    if args.model is None:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from utils import create_tiny_llama_checkpoint
        args.model = "/tmp/nmv-prefix-bench-model"
        create_tiny_llama_checkpoint(args.model)
        args.dtype = "float32"
        args.max_model_len = min(args.max_model_len, 2048)

    from neural_magic_vllm_tpu import LLM, SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              enable_prefix_caching=args.enable_prefix_caching,
              max_num_seqs=min(args.num_prompts, 64))
    vocab = llm.llm_engine.model_config.get_vocab_size()

    import numpy as np
    rng = np.random.default_rng(0)
    prefix = rng.integers(1, vocab, size=args.prefix_len).tolist()
    prompts = [prefix + rng.integers(1, vocab, size=args.unique_len).tolist()
               for _ in range(args.num_prompts)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    # cold: the first batch pays the prefix compute (and populates the
    # cache when enabled)
    t0 = time.perf_counter()
    llm.generate(prompt_token_ids=[prompts[0]], sampling_params=sp,
                 use_tqdm=False)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                 use_tqdm=False)
    warm = time.perf_counter() - t0

    print(f"cold first-request time: {cold:.3f}s")
    print(f"warm batch time ({args.num_prompts} prompts, prefix "
          f"{'cached' if args.enable_prefix_caching else 'uncached'}): "
          f"{warm:.3f}s")


if __name__ == "__main__":
    main()
