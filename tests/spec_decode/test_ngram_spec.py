"""Speculative decoding tests (reference tests/spec_decode/ +
e2e greedy-equality strategy of tests/spec_decode/e2e/): the ngram path
must produce EXACTLY the same greedy tokens as the plain engine —
speculative decoding is lossless."""
import numpy as np
import pytest

from neural_magic_vllm_tpu.spec_decode import (NGramProposer,
                                               rejection_sample_greedy,
                                               rejection_sample_onehot)


def test_ngram_proposer_finds_repeats():
    p = NGramProposer(ngram_max=3, ngram_min=1, k=3)
    # ... 5 6 7 ... 5 6 -> propose continuation 7 then following
    ids = [1, 5, 6, 7, 8, 9, 2, 3, 5, 6]
    out = p.propose(ids)
    assert out is not None and out[0] == 7
    assert out == [7, 8, 9]


def test_ngram_proposer_no_match():
    p = NGramProposer(ngram_max=3, ngram_min=2, k=3)
    assert p.propose([1, 2, 3, 4, 5]) is None


def test_ngram_proposer_short_match_truncates():
    p = NGramProposer(ngram_max=2, ngram_min=1, k=4)
    ids = [9, 8, 9]  # match "9" at idx 0, continuation [8, 9] (2 < k)
    out = p.propose(ids)
    assert out == [8, 9]


def test_rejection_greedy_accepts_matching():
    V = 16
    logits = np.full((4, V), -10.0, np.float32)
    # target argmaxes: 3, 5, 7, 9
    for i, t in enumerate((3, 5, 7, 9)):
        logits[i, t] = 5.0
    assert rejection_sample_greedy(logits, [3, 5, 7]) == [3, 5, 7, 9]
    # mismatch at position 1 -> correction token, stop
    assert rejection_sample_greedy(logits, [3, 6, 7]) == [3, 5]
    # no proposals -> just the bonus token
    assert rejection_sample_greedy(logits[:1], []) == [3]


def test_rejection_onehot_distribution_is_target():
    """Accept/resample must reproduce the target distribution exactly."""
    rng = np.random.default_rng(0)
    V = 4
    logits = np.log(np.array([[0.6, 0.2, 0.1, 0.1],
                              [0.25, 0.25, 0.25, 0.25]], np.float32))
    counts = np.zeros(V)
    N = 20000
    for _ in range(N):
        toks = rejection_sample_onehot(logits, [1], 1.0, rng)
        counts[toks[0]] += 1
    freq = counts / N
    np.testing.assert_allclose(freq, [0.6, 0.2, 0.1, 0.1], atol=0.02)


@pytest.fixture(scope="module")
def spec_and_plain(tiny_llama_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams

    def build(spec: bool):
        kwargs = dict(model=tiny_llama_dir, dtype="float32",
                      max_model_len=128, block_size=16,
                      num_gpu_blocks_override=64, max_num_seqs=8,
                      enforce_eager=True, disable_log_stats=True)
        if spec:
            kwargs.update(num_speculative_tokens=3,
                          ngram_prompt_lookup_max=3,
                          ngram_prompt_lookup_min=1)
        return LLM(**kwargs)

    return build


def test_spec_decode_greedy_matches_plain(spec_and_plain):
    from neural_magic_vllm_tpu import SamplingParams
    # repetitive prompts so ngram lookup actually fires
    prompts = [
        [1, 7, 8, 9, 7, 8, 9, 7, 8],
        [1, 5, 6, 5, 6, 5, 6, 5],
        [1, 30, 31, 32, 33, 34, 35],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True,
                        detokenize=False)
    out_plain = [
        list(o.outputs[0].token_ids) for o in spec_and_plain(False).generate(
            prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)
    ]
    out_spec = [
        list(o.outputs[0].token_ids) for o in spec_and_plain(True).generate(
            prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)
    ]
    assert out_spec == out_plain


def test_spec_decode_stochastic_ingraph_engaged(spec_and_plain):
    """temperature > 0 ngram verification rides the in-graph rejection
    executable (VERDICT r4 #4) and seeded runs reproduce."""
    from neural_magic_vllm_tpu import SamplingParams
    prompts = [
        [1, 7, 8, 9, 7, 8, 9, 7, 8],
        [1, 5, 6, 5, 6, 5, 6, 5],
    ]
    sp = SamplingParams(temperature=1.0, seed=5, max_tokens=10,
                        ignore_eos=True, detokenize=False)
    llm = spec_and_plain(True)
    a = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    b = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    assert a == b
    assert all(len(t) == 10 for t in a)
    runner = llm.llm_engine.model_executor.driver_worker.model_runner
    assert any(k[0] == "decode_spec_verify_stoch" for k in runner._fns)
