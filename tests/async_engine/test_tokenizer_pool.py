"""--tokenizer-pool-size: async prompt tokenization offload must produce
identical tokens to inline tokenization and actually run on the pool."""
import asyncio

import pytest

from neural_magic_vllm_tpu import SamplingParams
from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine


@pytest.mark.parametrize("pool", [0, 2])
def test_tokenizer_pool_matches_inline(tiny_llama_dir, pool):
    async def run():
        engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
            model=tiny_llama_dir, dtype="float32", max_model_len=128,
            block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
            enforce_eager=True, disable_log_stats=True,
            tokenizer_pool_size=pool))
        assert (engine._tokenizer_pool is not None) == (pool > 0)
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        final = None
        async for out in engine.generate("hello tokenizer pool world",
                                         sp, "r1"):
            final = out
        ids = list(final.outputs[0].token_ids)
        assert len(ids) == 6
        assert final.prompt_token_ids == \
            engine.engine.tokenizer.encode("hello tokenizer pool world")
        await engine.shutdown() if hasattr(engine, "shutdown") else None
        return ids

    ids = asyncio.run(run())
    if not hasattr(test_tokenizer_pool_matches_inline, "_ref"):
        test_tokenizer_pool_matches_inline._ref = {}
    test_tokenizer_pool_matches_inline._ref[pool] = ids
    ref = test_tokenizer_pool_matches_inline._ref
    if 0 in ref and 2 in ref:
        assert ref[0] == ref[2]
