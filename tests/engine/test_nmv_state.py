"""Fast-reload state format: save the canonical tree, reload with
--load-format nmv, greedy outputs must match exactly."""
import pytest


@pytest.mark.slow
def test_nmv_state_roundtrip(tiny_llama_dir, tmp_path):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    import shutil
    import os

    prompts = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)

    kwargs = dict(dtype="float32", max_model_len=128, block_size=16,
                  num_gpu_blocks_override=64, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True)
    llm = LLM(model=tiny_llama_dir, **kwargs)
    base = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]

    # save into a copy of the checkpoint dir (configs/tokenizer reused)
    saved = str(tmp_path / "saved")
    shutil.copytree(tiny_llama_dir, saved)
    os.remove(os.path.join(saved, "model.safetensors"))
    llm.llm_engine.save_state(saved)
    del llm

    llm2 = LLM(model=saved, load_format="nmv", **kwargs)
    again = [list(o.outputs[0].token_ids) for o in llm2.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    assert again == base
