"""Prefix caching: a shared system prompt's KV blocks are computed once
and reused by later requests (reference
examples/offline_inference_with_prefix.py).

Usage: python examples/offline_inference_with_prefix.py <ckpt>
"""
import sys
import time

from neural_magic_vllm_tpu import LLM, SamplingParams

PREFIX = ("You are a terse assistant. Answer in one sentence. "
          "Context: the user is asking about geography. ") * 4


def main():
    llm = LLM(model=sys.argv[1], enable_prefix_caching=True)
    sp = SamplingParams(temperature=0.0, max_tokens=32)

    t0 = time.perf_counter()
    llm.generate([PREFIX + "What is the capital of France?"], sp)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = llm.generate([PREFIX + "And of Japan?"], sp)
    warm = time.perf_counter() - t0

    print(outs[0].outputs[0].text)
    print(f"first request {cold:.2f}s, prefix-cached request {warm:.2f}s")


if __name__ == "__main__":
    main()
