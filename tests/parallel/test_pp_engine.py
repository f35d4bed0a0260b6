"""Engine-level pipeline parallelism: --pipeline-parallel-size 2 (and
pp2 x tp2) greedy outputs must exactly match pp1 on the 8-virtual-device
CPU mesh, through the full stack (scheduler -> executor -> model runner ->
GPipe step), including batched prefill and fused multi-step decode.

Reference contract: PP serving via virtual engines
(vllm/engine/llm_engine.py:303-307, vllm/worker/worker_base.py:266-278);
here a single in-graph GPipe dispatch replaces them.
"""
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from neural_magic_vllm_tpu import LLM, SamplingParams

from ..utils import create_tiny_llama_checkpoint

PROMPTS = [f"Counting up from {i}:" for i in range(6)]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pp-model")
    return create_tiny_llama_checkpoint(str(d / "tiny"))


def _generate(model_dir, pp, tp, **kw):
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              pipeline_parallel_size=pp, tensor_parallel_size=tp,
              enforce_eager=True, **kw)
    outs = llm.generate(PROMPTS,
                        SamplingParams(temperature=0.0, max_tokens=16))
    return [tuple(o.outputs[0].token_ids) for o in outs]


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2)])
def test_pp_engine_matches_pp1(model_dir, pp, tp):
    baseline = _generate(model_dir, 1, 1)
    pp_out = _generate(model_dir, pp, tp)
    assert pp_out == baseline


def test_pp_engine_multi_step(model_dir):
    """PP composes with fused multi-step decode (K iterations/dispatch)."""
    baseline = _generate(model_dir, 1, 1)
    pp_out = _generate(model_dir, 2, 1, num_scheduler_steps=4)
    assert pp_out == baseline


def test_block_bytes_divides_by_pp():
    """KV-cache sizing is per chip: each stage holds layers/pp of every
    block, so bytes-per-block must divide by pipeline_parallel_size (the
    global-shaped stack is sharded over the stage axis)."""
    from types import SimpleNamespace

    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, ModelConfig,
                                              ParallelConfig)
    from neural_magic_vllm_tpu.worker.worker import Worker

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=4, num_attention_heads=4,
                     num_key_value_heads=2)
    hf.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig(model="x", dtype="float32", max_model_len=64,
                     hf_config=hf, skip_tokenizer_init=True)
    cc = CacheConfig(block_size=16)

    def bb(pp):
        w = SimpleNamespace(
            model_config=mc, cache_config=cc,
            parallel_config=ParallelConfig(pipeline_parallel_size=pp),
            model_runner=SimpleNamespace(draft_model_config=None))
        w._per_chip_kv_heads = lambda m: Worker._per_chip_kv_heads(w, m)
        return Worker._block_bytes(w)

    assert bb(2) * 2 == bb(1)
    assert bb(4) * 4 == bb(1)


def test_block_bytes_kv_replication_and_cpu_pool():
    """(a) When TP does not divide the kv-head count the cache REPLICATES
    (kv_sharding) — per-chip sizing must use all heads, not heads//tp.
    (b) The CPU swap pool is one GLOBAL allocation on the controller
    host, so its block budget must use global bytes (all heads, all
    layers), not per-chip bytes."""
    from types import SimpleNamespace

    from transformers import LlamaConfig

    from neural_magic_vllm_tpu.config import (CacheConfig, ModelConfig,
                                              ParallelConfig)
    from neural_magic_vllm_tpu.worker.worker import Worker

    hf = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=4, num_attention_heads=8,
                     num_key_value_heads=2)
    hf.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig(model="x", dtype="float32", max_model_len=64,
                     hf_config=hf, skip_tokenizer_init=True)
    cc = CacheConfig(block_size=16)

    def w(tp, pp=1):
        return SimpleNamespace(
            model_config=mc, cache_config=cc,
            parallel_config=ParallelConfig(tensor_parallel_size=tp,
                                           pipeline_parallel_size=pp),
            model_runner=SimpleNamespace(draft_model_config=None),
            _per_chip_kv_heads=lambda m, _w=None: None)

    def bb(tp, pp=1, per_chip=True):
        ww = w(tp, pp)
        ww._per_chip_kv_heads = lambda m: Worker._per_chip_kv_heads(ww, m)
        return Worker._block_bytes(ww, per_chip=per_chip)

    # tp=2 divides 2 kv heads -> shards (half per chip)
    assert bb(2) * 2 == bb(1)
    # tp=4 does NOT divide 2 kv heads -> replicated (full size per chip)
    assert bb(4) == bb(1)
    # global (CPU pool) bytes never divide by tp or pp
    assert bb(2, per_chip=False) == bb(1)
    assert bb(2, pp=2, per_chip=False) == bb(1)
