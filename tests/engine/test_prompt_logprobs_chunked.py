"""Prompt logprobs under chunked prefill must cover EVERY prompt position
and match the one-shot prefill values (regression: previously only the
first chunk produced logprobs; reference parity: prompt_logprobs over
the full prompt)."""
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # full-engine e2e


from tests.utils import create_tiny_llama_checkpoint

PROMPT = list(range(1, 41))  # 40 tokens -> 3 chunks of 16 when chunked


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("plp") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=64,
                                        intermediate_size=128,
                                        num_hidden_layers=2,
                                        num_attention_heads=4,
                                        num_key_value_heads=2)


def _chosen_logprobs(model_dir, chunked):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    kw = dict(enable_chunked_prefill=True,
              max_num_batched_tokens=16) if chunked else {}
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=2, prompt_logprobs=2)
    out = llm.generate(prompt_token_ids=[PROMPT], sampling_params=sp,
                       use_tqdm=False)[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(PROMPT)
    assert plp[0] is None and all(d is not None for d in plp[1:])
    return [plp[i][PROMPT[i]].logprob for i in range(1, len(PROMPT))]


def test_chunked_prompt_logprobs_match_one_shot(ckpt):
    np.testing.assert_allclose(_chosen_logprobs(ckpt, True),
                               _chosen_logprobs(ckpt, False),
                               rtol=1e-4, atol=1e-5)
