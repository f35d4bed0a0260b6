"""Multi-host follower replay for the dispatch kinds beyond plain
prefill/decode: speculative (ngram / draft-model / MLPSpeculator) and
embedding pooling.

A recording control plane captures every broadcast a driver engine emits
(roundtripped through the wire format, so the fixed schema is exercised
for every kind); an identically-constructed follower engine replays them
through follower_step. The multi-host contract is that every host enters
the same executable with the same host inputs, so after the run the
follower's KV caches (and draft-model caches) must EXACTLY equal the
driver's.

Reference contract: driver/follower loop, worker_base.py:57-66,215-282.
"""
import jax
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from neural_magic_vllm_tpu.parallel.multihost import (StepPayload,
                                                      follower_step)
from tests.utils import create_tiny_llama_checkpoint

PROMPTS = [
    [1, 7, 8, 9, 7, 8, 9, 7, 8],
    [1, 5, 9, 300, 301, 302],
    [1, 42],
]
MAX_NEW = 8


class _RecordingPlane:
    """Driver-side stand-in for HostControlPlane: capture + re-decode."""

    rank = 0

    def __init__(self):
        self.payloads = []

    def broadcast(self, payload: StepPayload) -> None:
        self.payloads.append(StepPayload.from_bytes(payload.to_bytes()))


def _llm(model_dir, **extra):
    from neural_magic_vllm_tpu import LLM
    kwargs = dict(model=model_dir, dtype="float32", max_model_len=128,
                  block_size=16, num_gpu_blocks_override=96, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True)
    kwargs.update(extra)
    return LLM(**kwargs)


def _worker(llm):
    return llm.llm_engine.model_executor.driver_worker


def _assert_tree_equal(t_a, t_b):
    la = jax.tree_util.tree_leaves(t_a)
    lb = jax.tree_util.tree_leaves(t_b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _drive_and_replay(build, run):
    """Build driver+follower engines, record the driver's broadcasts, replay
    them on the follower, and compare device cache state exactly."""
    driver = build()
    plane = _RecordingPlane()
    _worker(driver).model_runner.control_plane = plane
    run(driver)
    assert plane.payloads, "driver emitted no broadcasts"

    follower = build()
    fw = _worker(follower)
    for p in plane.payloads:
        follower_step(p, fw.model_runner, fw.cache_engine)

    dw = _worker(driver)
    _assert_tree_equal(dw.cache_engine.kv_caches, fw.cache_engine.kv_caches)
    if getattr(dw.model_runner, "draft_cache_engine", None) is not None:
        _assert_tree_equal(dw.model_runner.draft_cache_engine.kv_caches,
                           fw.model_runner.draft_cache_engine.kv_caches)
    return {p.kind for p in plane.payloads}


def _generate(llm):
    from neural_magic_vllm_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                        ignore_eos=True, detokenize=False)
    llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                 use_tqdm=False)


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mh_replay") / "target")
    create_tiny_llama_checkpoint(d, hidden_size=64, intermediate_size=128,
                                 num_hidden_layers=2, seed=0)
    return d


def test_replay_ngram_spec(target_dir):
    kinds = _drive_and_replay(
        lambda: _llm(target_dir, num_speculative_tokens=3,
                     ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1),
        _generate)
    assert "decode_logits" in kinds  # the flat spec verification dispatch


def test_replay_draft_model_spec(target_dir, tmp_path_factory):
    draft = str(tmp_path_factory.mktemp("mh_replay_d") / "draft")
    create_tiny_llama_checkpoint(draft, hidden_size=32,
                                 intermediate_size=64, num_hidden_layers=2,
                                 num_attention_heads=2,
                                 num_key_value_heads=2, seed=7)
    kinds = _drive_and_replay(
        lambda: _llm(target_dir, speculative_model=draft,
                     num_speculative_tokens=3),
        _generate)
    assert "draft_prefill" in kinds and "spec_draft" in kinds


def test_replay_mlp_speculator(target_dir, tmp_path_factory):
    from tests.spec_decode.test_mlp_speculator import \
        create_tiny_mlp_speculator
    spec = str(tmp_path_factory.mktemp("mh_replay_m") / "spec")
    create_tiny_mlp_speculator(spec, emb_dim=64)
    kinds = _drive_and_replay(
        lambda: _llm(target_dir, speculative_model=spec,
                     num_speculative_tokens=3),
        _generate)
    assert "decode_logits_hidden" in kinds and "mlp_propose" in kinds


def test_replay_embedding(target_dir, tmp_path):
    import json
    import os
    import shutil
    d = str(tmp_path / "embed")
    shutil.copytree(target_dir, d)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["LlamaModel"]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    kinds = _drive_and_replay(
        lambda: _llm(d),
        lambda llm: llm.encode(prompt_token_ids=PROMPTS, use_tqdm=False))
    assert kinds == {"prefill_hidden"}


def test_replay_lora(target_dir, tmp_path):
    """LoRA serving across hosts: the broadcast carries the slot table +
    per-row slot indices; the follower mirrors the driver's slots (loading
    adapters from the shared checkpoint path) so both hosts compute with
    identical stacks — proven by exact KV-cache equality after replaying
    an adapter-carrying run."""
    from tests.lora.test_lora import _make_adapter
    from neural_magic_vllm_tpu import SamplingParams
    from neural_magic_vllm_tpu.lora import LoRARequest
    a1 = str(tmp_path / "adapter1")
    _make_adapter(a1, target_dir, seed=3)
    req = LoRARequest("a1", 1, a1)
    kw = dict(enable_lora=True, max_loras=2, max_lora_rank=8)

    def run(llm):
        sp = SamplingParams(temperature=0.0, max_tokens=MAX_NEW,
                            ignore_eos=True, detokenize=False)
        llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                     use_tqdm=False, lora_request=req)

    kinds = _drive_and_replay(lambda: _llm(target_dir, **kw), run)
    assert "decode_multi" in kinds or "decode_sample" in kinds


def test_replay_lora_adapterless(target_dir):
    """--enable-lora with no adapter in any request must still replay
    identically (the stacks are passed either way — a None-vs-stacks
    split would be a different executable on the follower)."""
    kw = dict(enable_lora=True, max_loras=2, max_lora_rank=8)
    _drive_and_replay(lambda: _llm(target_dir, **kw), _generate)
