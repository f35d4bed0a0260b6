"""Speculative decoding, all three proposers (reference
examples/offline_inference_mlpspeculator.py + spec-decode docs).

Usage:
  python examples/offline_inference_spec_decode.py <target-ckpt>                 # ngram
  python examples/offline_inference_spec_decode.py <target-ckpt> <draft-ckpt>    # draft model
  (an MLPSpeculator checkpoint as <draft-ckpt> selects the MLP proposer)
"""
import sys
import time

from neural_magic_vllm_tpu import LLM, SamplingParams


def main():
    target = sys.argv[1]
    kw = dict(num_speculative_tokens=4)
    if len(sys.argv) > 2:
        kw["speculative_model"] = sys.argv[2]
    else:
        kw.update(ngram_prompt_lookup_max=4, ngram_prompt_lookup_min=1)
    llm = LLM(model=target, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=128, ignore_eos=True)
    t0 = time.perf_counter()
    outs = llm.generate(["Repeat after me: the quick brown fox jumps "
                         "over the lazy dog. The quick brown"], sp)
    dt = time.perf_counter() - t0
    n = len(outs[0].outputs[0].token_ids)
    print(outs[0].outputs[0].text)
    print(f"{n} tokens in {dt:.2f}s ({n / dt:.1f} tok/s; acceptance "
          "stats are in the engine's spec-decode metrics log)")


if __name__ == "__main__":
    main()
