"""Materialize a servable model directory for the on-chip serving bench:
Llama-3-8B-architecture GPTQ W4A16 config + a full-vocab offline tokenizer
+ the cached nmv_state weights from the throughput bench (bench.py), so
the OpenAI server can serve the SAME model the decode bench measures.

Usage: python benchmarks/prepare_serving_dir.py [dir]
"""
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser(
        "~/.cache/nmv_tpu/llama3-8b-serve")
    state = os.path.expanduser("~/.cache/nmv_tpu/llama3-8b-w4a16/nmv_state")
    if not os.path.isdir(state):
        sys.exit(f"run bench.py first to create {state}")
    os.makedirs(out, exist_ok=True)
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": 128256, "hidden_size": 4096,
        "intermediate_size": 14336, "num_hidden_layers": 32,
        "num_attention_heads": 32, "num_key_value_heads": 8,
        "max_position_embeddings": 8192, "rms_norm_eps": 1e-5,
        "rope_theta": 500000.0, "torch_dtype": "bfloat16",
        "quantization_config": {
            "quant_method": "gptq", "bits": 4, "group_size": 128,
            "sym": True, "desc_act": False,
        },
    }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    from utils import create_tiny_tokenizer
    create_tiny_tokenizer(out, vocab_size=128256)
    dst = os.path.join(out, "nmv_state")
    if not os.path.isdir(dst):
        os.symlink(state, dst, target_is_directory=True)
    print(out)


if __name__ == "__main__":
    main()
