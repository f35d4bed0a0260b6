"""Draft-model speculative decoding: lossless — greedy outputs must EXACTLY
match the plain engine regardless of draft quality (reference
tests/spec_decode/e2e greedy-equality strategy)."""
import pytest

from tests.utils import create_tiny_llama_checkpoint

PROMPTS = [
    [1, 7, 8, 9, 7, 8, 9, 7, 8],
    [1, 5, 9, 300, 301, 302],
    [1, 42],
]
MAX_NEW = 10


@pytest.fixture(scope="module")
def target_and_draft(tmp_path_factory):
    base = tmp_path_factory.mktemp("spec_models")
    target = str(base / "target")
    draft = str(base / "draft")
    create_tiny_llama_checkpoint(target, hidden_size=64,
                                 intermediate_size=128,
                                 num_hidden_layers=2, seed=0)
    # different seed: a BAD draft — correctness must not depend on it
    create_tiny_llama_checkpoint(draft, hidden_size=32,
                                 intermediate_size=64,
                                 num_hidden_layers=2,
                                 num_attention_heads=2,
                                 num_key_value_heads=2, seed=7)
    return target, draft


def _llm(target, draft=None, k=3):
    from neural_magic_vllm_tpu import LLM
    kwargs = dict(model=target, dtype="float32", max_model_len=128,
                  block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True)
    if draft:
        kwargs.update(speculative_model=draft, num_speculative_tokens=k)
    return LLM(**kwargs)


def _greedy(llm):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_draft_spec_greedy_matches_plain(target_and_draft):
    target, draft = target_and_draft
    plain = _greedy(_llm(target))
    spec = _greedy(_llm(target, draft))
    assert spec == plain


def test_draft_spec_metrics_populated(target_and_draft):
    target, draft = target_and_draft
    llm = _llm(target, draft)
    _greedy(llm)
    runner = llm.llm_engine.model_executor.driver_worker.model_runner
    m = runner._spec_metrics
    assert m.num_steps > 0
    assert m.emitted_tokens >= m.num_steps  # >= 1 token per step per seq
    assert 0.0 <= m.draft_acceptance_rate <= 1.0


def test_draft_spec_seeded_sampling_reproducible(target_and_draft):
    from neural_magic_vllm_tpu import SamplingParams
    target, draft = target_and_draft
    llm = _llm(target, draft)
    sp = SamplingParams(temperature=0.8, seed=11, max_tokens=8,
                        ignore_eos=True, detokenize=False)
    a = llm.generate(prompt_token_ids=[PROMPTS[0]], sampling_params=sp,
                     use_tqdm=False)[0].outputs[0].token_ids
    b = llm.generate(prompt_token_ids=[PROMPTS[0]], sampling_params=sp,
                     use_tqdm=False)[0].outputs[0].token_ids
    assert list(a) == list(b)


@pytest.mark.slow
def test_draft_spec_smaller_tp(target_and_draft):
    """Draft at TP1 (replicated) while the target runs TP4 — greedy must
    still exactly match the plain TP4 engine (reference
    SmallerTpProposerWorker, spec_decode/smaller_tp_proposer_worker.py)."""
    from neural_magic_vllm_tpu import LLM
    target, draft = target_and_draft
    base = dict(model=target, dtype="float32", max_model_len=128,
                block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                enforce_eager=True, disable_log_stats=True,
                tensor_parallel_size=4)
    plain = _greedy(LLM(**base))
    spec = _greedy(LLM(**base, speculative_model=draft,
                       num_speculative_tokens=3,
                       speculative_draft_tensor_parallel_size=1))
    assert spec == plain
