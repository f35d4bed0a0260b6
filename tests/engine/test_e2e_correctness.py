"""End-to-end correctness: our engine's greedy decode vs HF transformers
(the reference's HfRunner-vs-VllmRunner strategy, tests/conftest.py:162,616).

Random tiny-Llama weights give near-flat distributions, so instead of exact
token match we require each sampled token to be HF's argmax OR within a tiny
logit gap of it (numerical tie)."""
import numpy as np
import pytest

from tests.utils import hf_forward_logits, hf_greedy_generate

PROMPT_IDS = [
    [1, 17, 29, 45, 8, 100],
    [1, 5, 9],
    [1, 200, 201, 202, 203, 204, 205, 206, 207, 208, 209, 210, 211],
]
MAX_NEW = 8


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    from neural_magic_vllm_tpu import LLM
    return LLM(model=tiny_llama_dir,
               dtype="float32",
               max_model_len=128,
               block_size=16,
               num_gpu_blocks_override=64,
               max_num_seqs=8,
               enforce_eager=True,
               disable_log_stats=True)


def check_vs_hf(model_dir, prompt, generated):
    """Each generated token must match HF argmax or tie within 2e-3."""
    seq = list(prompt)
    for tok in generated:
        logits = hf_forward_logits(model_dir, seq)[0, -1]
        hf_top = int(np.argmax(logits))
        assert (tok == hf_top
                or abs(logits[tok] - logits[hf_top]) < 2e-3), \
            f"token {tok} vs hf {hf_top}, gap " \
            f"{abs(logits[tok]-logits[hf_top])}"
        seq.append(tok)


def test_greedy_matches_hf(llm, tiny_llama_dir):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outputs = llm.generate(prompt_token_ids=PROMPT_IDS,
                           sampling_params=sp, use_tqdm=False)
    assert len(outputs) == len(PROMPT_IDS)
    for prompt, out in zip(PROMPT_IDS, outputs):
        gen = out.outputs[0].token_ids
        assert len(gen) == MAX_NEW
        check_vs_hf(tiny_llama_dir, prompt, gen)


def test_greedy_batch_invariance(llm):
    """Decoding the same prompt alone or in a batch gives the same tokens
    (static-shape paged attention must be batch-size invariant)."""
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    solo = llm.generate(prompt_token_ids=[PROMPT_IDS[0]],
                        sampling_params=sp, use_tqdm=False)
    batch = llm.generate(prompt_token_ids=PROMPT_IDS,
                         sampling_params=sp, use_tqdm=False)
    assert solo[0].outputs[0].token_ids == batch[0].outputs[0].token_ids


def test_long_decode_across_blocks(llm, tiny_llama_dir):
    """Decode past several block boundaries (block_size=16)."""
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True,
                        detokenize=False)
    out = llm.generate(prompt_token_ids=[PROMPT_IDS[1]],
                       sampling_params=sp, use_tqdm=False)[0]
    gen = out.outputs[0].token_ids
    assert len(gen) == 40
    # spot check the first 6 tokens against HF
    check_vs_hf(tiny_llama_dir, PROMPT_IDS[1], gen[:6])


def test_hf_golden_full_match(tiny_llama_dir, llm):
    """Full-sequence greedy comparison via HF generate (tie-tolerant)."""
    hf_out = hf_greedy_generate(tiny_llama_dir, [PROMPT_IDS[0]], MAX_NEW)[0]
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    ours = llm.generate(prompt_token_ids=[PROMPT_IDS[0]],
                        sampling_params=sp,
                        use_tqdm=False)[0].outputs[0].token_ids
    # sequences may diverge after the first tie; require the first token to
    # agree with HF outright or by tie.
    check_vs_hf(tiny_llama_dir, PROMPT_IDS[0], ours[:1])
    if ours[0] == hf_out[0]:
        matches = sum(a == b for a, b in zip(ours, hf_out))
        assert matches >= MAX_NEW - 2
