"""Engine-level tensor parallelism on the virtual CPU mesh: TP=2 greedy
must exactly match TP=1, including LoRA serving (default and
--fully-sharded-loras; reference tests/distributed + tests/lora TP
matrix)."""
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from tests.utils import create_tiny_llama_checkpoint

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]


@pytest.fixture(scope="module")
def base_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tp") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=64,
                                        intermediate_size=128,
                                        num_hidden_layers=2,
                                        num_attention_heads=4,
                                        num_key_value_heads=2)


def _greedy(model_dir, tp=1, lora_request=None, **kw):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              tensor_parallel_size=tp, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False, lora_request=lora_request)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_tp2_matches_tp1(base_dir):
    assert _greedy(base_dir, tp=2) == _greedy(base_dir, tp=1)


def test_tp2_lora_default_and_fully_sharded(base_dir, tmp_path):
    from tests.lora.test_lora import _make_adapter
    from neural_magic_vllm_tpu.lora import LoRARequest
    a1 = str(tmp_path / "adapter1")
    _make_adapter(a1, base_dir, seed=1)
    req = LoRARequest("a1", 1, a1)
    kw = dict(enable_lora=True, max_loras=2, max_lora_rank=8)
    ref = _greedy(base_dir, tp=1, lora_request=req, **kw)
    assert _greedy(base_dir, tp=2, lora_request=req, **kw) == ref
    assert _greedy(base_dir, tp=2, lora_request=req,
                   fully_sharded_loras=True, **kw) == ref
