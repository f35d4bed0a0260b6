"""Feature e2e tests: fp8 KV cache (+ scales via --quantization-param-path),
chunked prefill, and prefix caching must all reproduce the plain engine's
greedy tokens (the reference's tests/basic_correctness + tests/fp8_kv +
tests/prefix_caching strategy)."""
import json

import numpy as np
import pytest

PROMPTS = [
    [1, 17, 29, 45, 8, 100, 7, 3, 9, 12, 44, 2, 61, 77, 5, 80, 81, 4, 19,
     33, 21, 50, 51, 52, 53, 54],
    [1, 5, 9, 301, 44, 7],
]
MAX_NEW = 8


def _greedy(model_dir, prompts=PROMPTS, **kwargs):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    base = dict(model=model_dir, dtype="float32", max_model_len=128,
                block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                enforce_eager=True, disable_log_stats=True)
    base.update(kwargs)
    llm = LLM(**base)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


@pytest.fixture(scope="module")
def baseline(tiny_llama_dir):
    return _greedy(tiny_llama_dir)


def test_fp8_kv_cache(tiny_llama_dir, baseline):
    """fp8 KV quantization noise should not flip greedy tokens for most
    positions; require >= 75% agreement (the reference's fp8-kv accuracy
    tests allow small deltas)."""
    out = _greedy(tiny_llama_dir, kv_cache_dtype="fp8")
    agree = sum(a == b for bl, o in zip(baseline, out)
                for a, b in zip(bl, o))
    total = sum(len(b) for b in baseline)
    assert agree / total >= 0.75, (baseline, out)


def test_fp8_kv_cache_with_scales(tiny_llama_dir, baseline, tmp_path):
    """Per-layer scales via --quantization-param-path (reference
    quantization/schema.py format)."""
    schema = {"kv_cache": {"scaling_factor": {"0": {"0": 0.05, "1": 0.08}}}}
    path = str(tmp_path / "kv_scales.json")
    with open(path, "w") as f:
        json.dump(schema, f)
    out = _greedy(tiny_llama_dir, kv_cache_dtype="fp8",
                  quantization_param_path=path)
    agree = sum(a == b for bl, o in zip(baseline, out)
                for a, b in zip(bl, o))
    total = sum(len(b) for b in baseline)
    assert agree / total >= 0.75, (baseline, out)


def test_chunked_prefill_matches(tiny_llama_dir, baseline):
    out = _greedy(tiny_llama_dir, enable_chunked_prefill=True,
                  max_num_batched_tokens=16)
    assert out == baseline


def test_prefix_caching_matches(tiny_llama_dir, baseline):
    """Second pass over shared-prefix prompts hits the prefix cache and
    must produce identical tokens."""
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              enable_prefix_caching=True)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    first = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=PROMPTS, sampling_params=sp, use_tqdm=False)]
    # same prompts again: prefix blocks are now cached/computed
    second = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=PROMPTS, sampling_params=sp, use_tqdm=False)]
    assert first == baseline
    assert second == baseline


def test_quantization_param_path_engine_arg(tiny_llama_dir, tmp_path):
    """EngineArgs exposes --quantization-param-path like the reference."""
    from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
    schema = {"kv_cache": {"scaling_factor": {"0": 0.1, "1": 0.1}}}
    path = str(tmp_path / "s.json")
    with open(path, "w") as f:
        json.dump(schema, f)
    args = EngineArgs(model=tiny_llama_dir, quantization_param_path=path)
    cfg = args.create_engine_config()
    assert cfg.model_config.quantization_param_path == path
