"""Serve several LoRA adapters in one continuous batch (reference
examples/multilora_inference.py).

Usage: python examples/multilora_inference.py <base-ckpt> <adapter1> [<adapter2> ...]
"""
import sys

from neural_magic_vllm_tpu import LLM, SamplingParams
from neural_magic_vllm_tpu.lora import LoRARequest


def main():
    base, *adapters = sys.argv[1:]
    llm = LLM(model=base, enable_lora=True, max_loras=max(len(adapters), 1),
              max_lora_rank=16)
    sp = SamplingParams(temperature=0.0, max_tokens=64)

    # one prompt per adapter + one base-model prompt, batched together:
    # the engine routes each row through its adapter slot in a single
    # dispatch (slot-stacked batched apply)
    prompts = ["Tell me about TPUs."] * (len(adapters) + 1)
    reqs = [None] + [
        LoRARequest(f"adapter{i}", i + 1, path)
        for i, path in enumerate(adapters)
    ]
    outs = llm.generate(prompts, sp, lora_request=reqs)
    for req, out in zip(reqs, outs):
        name = req.lora_name if req else "base"
        print(f"--- {name} ---")
        print(out.outputs[0].text)


if __name__ == "__main__":
    main()
