"""Multi-step (fused K-iteration) decode correctness: outputs must equal
single-step decoding exactly (greedy) on the same model."""
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9], [1, 7, 11, 13, 17, 19, 23]]


def make_llm(tiny_llama_dir, **kw):
    from neural_magic_vllm_tpu import LLM
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
               enforce_eager=True, disable_log_stats=True, **kw)


def test_multi_step_matches_single_step(tiny_llama_dir):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=17, ignore_eos=True,
                        detokenize=False)
    single = make_llm(tiny_llama_dir)
    ref = [o.outputs[0].token_ids
           for o in single.generate(prompt_token_ids=PROMPTS,
                                    sampling_params=sp, use_tqdm=False)]
    del single
    multi = make_llm(tiny_llama_dir, num_scheduler_steps=4)
    got = [o.outputs[0].token_ids
           for o in multi.generate(prompt_token_ids=PROMPTS,
                                   sampling_params=sp, use_tqdm=False)]
    assert got == ref
    # max_tokens=17 is not a multiple of 4: over-generated tail discarded
    assert all(len(g) == 17 for g in got)


def test_multi_step_seeded_matches_single_step(tiny_llama_dir):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.9, top_k=50, seed=7, max_tokens=12,
                        ignore_eos=True, detokenize=False)
    single = make_llm(tiny_llama_dir)
    ref = single.generate(prompt_token_ids=PROMPTS[:1], sampling_params=sp,
                          use_tqdm=False)[0].outputs[0].token_ids
    del single
    multi = make_llm(tiny_llama_dir, num_scheduler_steps=4)
    got = multi.generate(prompt_token_ids=PROMPTS[:1], sampling_params=sp,
                         use_tqdm=False)[0].outputs[0].token_ids
    assert got == ref
