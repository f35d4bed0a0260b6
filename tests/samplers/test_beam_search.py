"""Beam search (reference tests/samplers/test_beam_search.py): engine beam
vs HF transformers beam on the same tiny checkpoint, plus structural
properties (beam count, score ordering, beats greedy)."""
import numpy as np
import pytest


def _llm(tiny_llama_dir):
    from neural_magic_vllm_tpu import LLM
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
               enforce_eager=True, disable_log_stats=True)

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9, 301]]
MAX_NEW = 6
BW = 2


def test_beam_search_matches_hf(tiny_llama_dir):
    from neural_magic_vllm_tpu import SamplingParams
    llm = _llm(tiny_llama_dir)
    sp = SamplingParams(use_beam_search=True, best_of=BW, n=1,
                        temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, length_penalty=1.0,
                        early_stopping="never", detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)

    import torch
    from transformers import AutoModelForCausalLM
    hf = AutoModelForCausalLM.from_pretrained(tiny_llama_dir,
                                              torch_dtype=torch.float32)
    hf.eval()
    for prompt, out in zip(PROMPTS, outs):
        with torch.no_grad():
            gen = hf.generate(torch.tensor([prompt]),
                              max_new_tokens=MAX_NEW,
                              min_new_tokens=MAX_NEW, num_beams=BW,
                              do_sample=False, early_stopping=False,
                              length_penalty=1.0, pad_token_id=0)
        hf_best = gen[0][len(prompt):].tolist()
        assert list(out.outputs[0].token_ids) == hf_best, \
            (list(out.outputs[0].token_ids), hf_best)


def test_beam_beats_greedy_logprob(tiny_llama_dir):
    from neural_magic_vllm_tpu import SamplingParams
    llm = _llm(tiny_llama_dir)
    sp_beam = SamplingParams(use_beam_search=True, best_of=3, n=3,
                             temperature=0.0, max_tokens=MAX_NEW,
                             ignore_eos=True, early_stopping="never",
                             detokenize=False)
    sp_greedy = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                               ignore_eos=True, logprobs=0,
                               detokenize=False)
    beam_out = llm.generate(prompt_token_ids=[PROMPTS[0]],
                            sampling_params=sp_beam, use_tqdm=False)[0]
    greedy_out = llm.generate(prompt_token_ids=[PROMPTS[0]],
                              sampling_params=sp_greedy, use_tqdm=False)[0]
    assert len(beam_out.outputs) == 3
    scores = [c.cumulative_logprob for c in beam_out.outputs]
    assert scores == sorted(scores, reverse=True)
    # the best beam is at least as likely as the greedy rollout
    assert scores[0] >= greedy_out.outputs[0].cumulative_logprob - 1e-6
