"""Engine-level data parallelism on the virtual CPU mesh: dp=2 greedy must
exactly match dp=1. The decode executables row-shard the batch over the
mesh "data" axis (model_runner._dp_batch_constraint), so this exercises
real GSPMD batch partitioning, not just replication. Composes with TP
(dp2 x tp2 uses 4 of the 8 virtual devices)."""
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens
from tests.utils import create_tiny_llama_checkpoint

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9], [7, 7, 7, 2], [9, 1]]


def _greedy(model_dir, dp=1, tp=1):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              data_parallel_size=dp, tensor_parallel_size=tp)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_dp2_matches_dp1(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dp") / "llama")
    create_tiny_llama_checkpoint(d, hidden_size=64, intermediate_size=128,
                                 num_hidden_layers=2, num_attention_heads=4,
                                 num_key_value_heads=2)
    ref = _greedy(d, dp=1)
    assert _greedy(d, dp=2) == ref
    assert _greedy(d, dp=2, tp=2) == ref
