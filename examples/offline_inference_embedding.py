"""Pooled embeddings with an embedding backbone (reference
examples/offline_inference_embedding.py).

Usage: python examples/offline_inference_embedding.py <embedding-ckpt>
(a checkpoint whose architectures list is e.g. ["LlamaModel"]).
"""
import sys

from neural_magic_vllm_tpu import LLM


def main():
    llm = LLM(model=sys.argv[1])
    outs = llm.encode(["A sentence to embed.",
                       "Another, rather different, sentence."])
    for out in outs:
        v = out.outputs.embedding
        print(f"dim={len(v)} first4={[round(x, 4) for x in v[:4]]}")


if __name__ == "__main__":
    main()
