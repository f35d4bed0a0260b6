"""Save the canonical device parameter tree for fast reload (reference
examples/save_sharded_state.py): quant repacking / HF name mapping /
transposes happen once, then --load-format nmv restores in seconds.

Usage: python examples/save_nmv_state.py <hf-ckpt-dir> [out-dir]
Then:  LLM(model=<out-dir or hf-ckpt-dir>, load_format="nmv")
"""
import sys

from neural_magic_vllm_tpu import LLM


def main():
    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else src
    llm = LLM(model=src, enforce_eager=True)
    llm.llm_engine.model_executor.save_state(out)
    print(f"saved nmv_state under {out}/nmv_state")


if __name__ == "__main__":
    main()
