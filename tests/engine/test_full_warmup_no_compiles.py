"""Serving fidelity contract: after --full-warmup, ordinary traffic
(fresh prefills at any bucket, batched prefills, fused decode) must hit
ZERO serve-time XLA compiles. The round-2 serving trace showed 11-18 s
serve-time compiles from unwarmed batched-prefill (t_pad, b_pad) combos
burying the TTFT tail; the batched-prefill width is now a function of the
token bucket alone and full warmup covers every bucket.

Reference analogue: CUDA-graph capture covering all decode batch sizes
(model_runner.py:910) / TPU warmup compiling every bucket
(tpu_model_runner.py:159-197).
"""
import logging

import pytest

from neural_magic_vllm_tpu import LLM, SamplingParams


class _CompileRecorder(logging.Handler):

    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling jit(fn)" in msg or "Compiling jit(_" in msg:
            self.records.append(msg[:200])


@pytest.mark.slow
def test_full_warmup_covers_serving_traffic(tiny_llama_dir):
    import jax
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=128, max_num_seqs=8,
              num_scheduler_steps=4, fused_dispatch_target_ms=1000.0,
              full_warmup=True)

    jax.config.update("jax_log_compiles", True)
    rec = _CompileRecorder()
    jax_logger = logging.getLogger("jax._src.interpreters.pxla")
    jax_logger.addHandler(rec)
    try:
        # mixed traffic: short + long prompts (different prefill buckets,
        # single and batched prefill) + fused decode at small batch
        prompts = ["hi", "hello " * 15, "three words here", "x " * 40,
                   "another prompt", "short"]
        outs = llm.generate(prompts, SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True))
        assert all(len(o.outputs[0].token_ids) == 8 for o in outs)
    finally:
        jax_logger.removeHandler(rec)
        jax.config.update("jax_log_compiles", False)

    assert not rec.records, (
        "serve-time compiles after full warmup:\n" + "\n".join(rec.records))
