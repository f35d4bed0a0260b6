"""End-to-end batch latency benchmark (role of reference
benchmarks/benchmark_latency.py): one batch of identical requests, timed
over several iterations; reports latency percentiles."""
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

    llm = LLM(model=args.model, quantization=args.quantization,
              dtype=args.dtype, max_model_len=args.max_model_len,
              max_num_seqs=args.batch_size, skip_tokenizer_init=True,
              num_scheduler_steps=args.num_scheduler_steps,
              enforce_eager=args.enforce_eager,
              load_format=args.load_format)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True, detokenize=False)

    def run_once():
        prompts = [
            rng.integers(1, vocab, size=args.input_len).tolist()
            for _ in range(args.batch_size)
        ]
        t0 = time.perf_counter()
        llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                     use_tqdm=False)
        return time.perf_counter() - t0

    for _ in range(args.num_iters_warmup):
        run_once()
    latencies = np.array([run_once() for _ in range(args.num_iters)])
    print(json.dumps({
        "avg_latency_s": round(float(latencies.mean()), 3),
        "p50_s": round(float(np.percentile(latencies, 50)), 3),
        "p90_s": round(float(np.percentile(latencies, 90)), 3),
        "p99_s": round(float(np.percentile(latencies, 99)), 3),
    }))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--quantization", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--load-format", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=2048)
    parser.add_argument("--num-scheduler-steps", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--num-iters-warmup", type=int, default=2)
    parser.add_argument("--num-iters", type=int, default=5)
    parser.add_argument("--enforce-eager", action="store_true")
    main(parser.parse_args())
