"""MLPSpeculator speculative decoding: lossless — greedy outputs must
EXACTLY match the plain engine regardless of speculator quality
(reference spec_decode/mlp_speculator_worker.py + its e2e greedy-equality
tests)."""
import json
import os

import numpy as np
import pytest

from tests.utils import create_tiny_llama_checkpoint

PROMPTS = [
    [1, 7, 8, 9, 7, 8, 9, 7, 8],
    [1, 5, 9, 300, 301, 302],
    [1, 42],
]
MAX_NEW = 10


def create_tiny_mlp_speculator(save_dir, *, vocab_size=512, emb_dim=64,
                               inner_dim=32, n_predict=3, seed=11):
    """Write an IBM-format MLPSpeculator checkpoint (emb/proj/head/ln per
    head + config.json with model_type mlp_speculator)."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    t = {}
    for i in range(n_predict):
        in_dim = emb_dim if i == 0 else inner_dim
        t[f"emb.{i}.weight"] = (rng.standard_normal(
            (vocab_size, inner_dim)) * 0.1).astype(np.float32)
        t[f"proj.{i}.weight"] = (rng.standard_normal(
            (inner_dim, in_dim)) * 0.1).astype(np.float32)
        t[f"head.{i}.weight"] = (rng.standard_normal(
            (vocab_size, inner_dim)) * 0.1).astype(np.float32)
        t[f"ln.{i}.weight"] = np.ones((inner_dim, ), np.float32)
        t[f"ln.{i}.bias"] = np.zeros((inner_dim, ), np.float32)
    os.makedirs(save_dir, exist_ok=True)
    save_file(t, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "mlp_speculator",
            "vocab_size": vocab_size,
            "emb_dim": emb_dim,
            "inner_dim": inner_dim,
            "n_predict": n_predict,
            "n_candidates": 1,
            "tie_weights": False,
            "scale_input": False,
        }, f)
    return save_dir


@pytest.fixture(scope="module")
def target_and_spec(tmp_path_factory):
    base = tmp_path_factory.mktemp("mlp_spec")
    target = str(base / "target")
    spec = str(base / "speculator")
    create_tiny_llama_checkpoint(target, hidden_size=64,
                                 intermediate_size=128,
                                 num_hidden_layers=2, seed=0)
    create_tiny_mlp_speculator(spec, emb_dim=64)
    return target, spec


def _llm(target, spec=None, k=3):
    from neural_magic_vllm_tpu import LLM
    kwargs = dict(model=target, dtype="float32", max_model_len=128,
                  block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True)
    if spec:
        kwargs.update(speculative_model=spec, num_speculative_tokens=k)
    return LLM(**kwargs)


def _greedy(llm):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_mlp_spec_greedy_matches_plain(target_and_spec):
    target, spec = target_and_spec
    plain = _greedy(_llm(target))
    spec_out = _greedy(_llm(target, spec))
    assert spec_out == plain


def test_mlp_spec_metrics(target_and_spec):
    target, spec = target_and_spec
    llm = _llm(target, spec)
    _greedy(llm)
    runner = llm.llm_engine.model_executor.driver_worker.model_runner
    assert runner.mlp_speculator is not None
    m = runner._spec_metrics
    assert m.num_steps > 0 and m.num_spec_tokens > 0


def test_mlp_speculator_config_detection(target_and_spec):
    _, spec = target_and_spec
    from neural_magic_vllm_tpu.transformers_utils.config import \
        get_hf_config
    cfg = get_hf_config(spec)
    assert cfg.model_type == "mlp_speculator"
    assert cfg.n_predict == 3 and cfg.emb_dim == 64
