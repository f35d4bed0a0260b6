"""Vision-language inference with LLaVA (reference
examples/llava_example.py; LLaVA-NeXT and Phi-3-Vision work the same way
with their own prompt formats).

Usage: python examples/llava_example.py <llava-ckpt> <image-path>
"""
import sys

import numpy as np

from neural_magic_vllm_tpu import LLM, SamplingParams


def main():
    ckpt, image_path = sys.argv[1], sys.argv[2]
    try:
        from PIL import Image
        image = Image.open(image_path).convert("RGB")
    except ImportError:
        # PIL-free fallback: any HxWx3 uint8 array is accepted
        image = np.zeros((336, 336, 3), np.uint8)
    llm = LLM(model=ckpt)
    prompt = "USER: <image>\nWhat is shown in this image? ASSISTANT:"
    outs = llm.generate([prompt], SamplingParams(temperature=0.0,
                                                 max_tokens=64),
                        multi_modal_data={"image": image})
    print(outs[0].outputs[0].text)


if __name__ == "__main__":
    main()
