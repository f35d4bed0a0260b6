"""End-to-end preemption correctness.

Reference contract: tests/basic_correctness/test_preemption.py — with the
artificial-preemption hook forcing the scheduler down its eviction paths,
greedy outputs must be identical to an unpreempted run, for both RECOMPUTE
(drop KV, re-prefill) and SWAP (KV to host and back) modes.

The hook (NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT, scheduler.py) makes
_can_append_slots claim "no space" with probability 0.5 for the first 500
decode steps, so every run exercises preempt + re-admission repeatedly.
"""
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from neural_magic_vllm_tpu import LLM, SamplingParams

from ..utils import create_tiny_llama_checkpoint


def _generate(model_dir, monkeypatch, preemption_mode=None, preempt=False):
    if preempt:
        monkeypatch.setenv("NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT", "1")
    else:
        monkeypatch.delenv("NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT",
                           raising=False)
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=48, max_num_seqs=4,
              swap_space=0.01, preemption_mode=preemption_mode,
              enforce_eager=True, disable_log_stats=False)
    prompts = [f"The number {i} is spelled" for i in range(8)]
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.0, max_tokens=24))
    num_preempted = llm.llm_engine.scheduler.num_cumulative_preemption
    return [tuple(o.outputs[0].token_ids) for o in outs], num_preempted


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("preempt-model")
    return create_tiny_llama_checkpoint(str(d / "tiny"))


@pytest.mark.parametrize("mode", ["recompute", "swap"])
def test_preempted_outputs_match_unpreempted(model_dir, monkeypatch, mode):
    baseline, n0 = _generate(model_dir, monkeypatch)
    assert n0 == 0
    preempted, n1 = _generate(model_dir, monkeypatch, preemption_mode=mode,
                              preempt=True)
    assert n1 > 0, "artificial preemption hook did not fire"
    assert preempted == baseline, (
        f"{mode} preemption changed greedy outputs")
