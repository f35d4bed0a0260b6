"""Offline engine throughput benchmark (role of reference
benchmarks/benchmark_throughput.py): N requests with given prompt/output
lengths through the LLM engine; reports requests/s and tokens/s.

python benchmarks/benchmark_throughput.py --model <dir-or-bench-config> \
    --num-prompts 128 --input-len 128 --output-len 128 [engine flags]
"""
import argparse
import json
import time

import numpy as np


def main(args: argparse.Namespace) -> None:
    import os
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root
    from synthetic import resolve_model

    from neural_magic_vllm_tpu import LLM, SamplingParams
    args.model = resolve_model(args.model)

    llm = LLM(model=args.model, tokenizer=args.tokenizer,
              quantization=args.quantization, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              kv_cache_dtype=args.kv_cache_dtype,
              enable_prefix_caching=args.enable_prefix_caching,
              enable_chunked_prefill=args.enable_chunked_prefill,
              enforce_eager=args.enforce_eager,
              num_scheduler_steps=args.num_scheduler_steps,
              skip_tokenizer_init=True,
              load_format=args.load_format)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(1, vocab, size=args.input_len).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = SamplingParams(temperature=args.temperature,
                        max_tokens=args.output_len, ignore_eos=True,
                        detokenize=False)

    for _ in range(args.warmup_rounds):  # compile all buckets untimed
        llm.generate(prompt_token_ids=prompts[:args.max_num_seqs],
                     sampling_params=sp, use_tqdm=False)

    start = time.perf_counter()
    outputs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                           use_tqdm=not args.quiet)
    elapsed = time.perf_counter() - start

    total_out = sum(len(o.outputs[0].token_ids) for o in outputs)
    total_tokens = total_out + args.num_prompts * args.input_len
    result = {
        "elapsed_s": round(elapsed, 2),
        "requests_per_s": round(args.num_prompts / elapsed, 2),
        "output_tokens_per_s": round(total_out / elapsed, 2),
        "total_tokens_per_s": round(total_tokens / elapsed, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--quantization", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--load-format", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=2048)
    parser.add_argument("--max-num-seqs", type=int, default=64)
    parser.add_argument("--max-num-batched-tokens", type=int, default=2048)
    parser.add_argument("--num-scheduler-steps", type=int, default=8)
    parser.add_argument("--num-prompts", type=int, default=128)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--enable-prefix-caching", action="store_true")
    parser.add_argument("--enable-chunked-prefill", action="store_true")
    parser.add_argument("--enforce-eager", action="store_true")
    parser.add_argument("--warmup-rounds", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    main(parser.parse_args())
