"""Ragged batched prefill must produce exactly the same greedy tokens as
the single-sequence prefill path (segment masking correctness e2e)."""
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # full-engine e2e


PROMPTS = [
    [1, 17, 29, 45, 8, 100, 7],
    [1, 5, 9],
    [1, 200, 201, 202, 203, 204, 205, 206, 207, 208, 209, 210],
    [1, 42],
]


def _llm(tiny_llama_dir):
    from neural_magic_vllm_tpu import LLM
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
               enforce_eager=True, disable_log_stats=True)


def _greedy(llm):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_batched_prefill_matches_single(tiny_llama_dir, monkeypatch):
    from neural_magic_vllm_tpu.worker.model_runner import TPUModelRunner
    llm = _llm(tiny_llama_dir)
    runner = llm.llm_engine.model_executor.driver_worker.model_runner

    called = {"batch": 0}
    orig = runner._execute_prefill_batch

    def counting(items, cache_engine):
        called["batch"] += 1
        return orig(items, cache_engine)

    monkeypatch.setattr(runner, "_execute_prefill_batch", counting)
    batched = _greedy(llm)
    assert called["batch"] >= 1  # the batched path actually ran

    llm2 = _llm(tiny_llama_dir)
    runner2 = llm2.llm_engine.model_executor.driver_worker.model_runner
    monkeypatch.setattr(runner2, "_prefill_batchable", lambda sgm: False)
    single = _greedy(llm2)
    assert batched == single


def test_seeded_sampling_same_across_paths(tiny_llama_dir, monkeypatch):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.8, seed=7, max_tokens=5,
                        ignore_eos=True, detokenize=False)

    def run(force_single):
        llm = _llm(tiny_llama_dir)
        if force_single:
            runner = llm.llm_engine.model_executor.driver_worker.\
                model_runner
            monkeypatch.setattr(runner, "_prefill_batchable",
                                lambda sgm: False)
        outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                            use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    assert run(False) == run(True)
