"""2:4 semi-structured sparse serving (reference
examples/offline_inference_sparse.py + offline_inference_24.py).

Usage: python examples/offline_inference_sparse.py <ckpt> [sparsity]
  sparsity: semi_structured_sparse_w16a16 (default) — for a 2:4-pruned
  dense checkpoint; gptq_marlin_24 checkpoints are auto-detected from
  their quantization_config instead (pass no sparsity arg).
"""
import sys

from neural_magic_vllm_tpu import LLM, SamplingParams


def main():
    ckpt = sys.argv[1]
    sparsity = sys.argv[2] if len(sys.argv) > 2 else \
        "semi_structured_sparse_w16a16"
    llm = LLM(model=ckpt, sparsity=sparsity)
    outs = llm.generate(["The benefits of sparsity are"],
                        SamplingParams(temperature=0.0, max_tokens=48))
    print(outs[0].outputs[0].text)


if __name__ == "__main__":
    main()
