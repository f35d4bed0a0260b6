"""Mixed fused decode+prefill window (VERDICT r4 #1): with chunked
prefill + multi-step decode, one prompt's chunk rides INSIDE the fused-K
decode dispatch. Greedy outputs must match the separate-dispatch path
token for token, and the mixed executable must actually engage."""
import pytest

from neural_magic_vllm_tpu import LLM, SamplingParams


def _mk_llm(tiny_llama_dir, **kw):
    import os
    # window at any decode batch size (default crossover is 64; these
    # tests exercise the window path itself at tiny batches)
    os.environ["NMV_TPU_MIXED_WINDOW_MIN_DECODE"] = "1"
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=192, max_num_seqs=8,
               num_scheduler_steps=4, enable_chunked_prefill=True,
               max_num_batched_tokens=64, enforce_eager=True, **kw)


def _runner(llm):
    return llm.llm_engine.model_executor.driver_worker.model_runner


PROMPTS = [
    "short one",
    "a much longer prompt " * 4,       # chunks across windows
    "mid length prompt with words " * 2,
    "tail",
    "another fairly long prompt needing chunks " * 2,
]
SP = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)


def test_mixed_window_matches_separate_path(tiny_llama_dir, monkeypatch):
    llm = _mk_llm(tiny_llama_dir)
    mixed = llm.generate(PROMPTS, SP)
    assert any(k[0] == "decode_multi_mixed" for k in _runner(llm)._fns), \
        "mixed fused window never engaged"

    monkeypatch.setenv("NMV_TPU_MIXED_PREFILL_WINDOW", "0")
    llm2 = _mk_llm(tiny_llama_dir)
    plain = llm2.generate(PROMPTS, SP)
    assert not any(k[0] == "decode_multi_mixed" for k in _runner(llm2)._fns)

    for m, p in zip(mixed, plain):
        assert list(m.outputs[0].token_ids) == list(p.outputs[0].token_ids)


def test_mixed_window_trickle_arrivals(tiny_llama_dir):
    """Requests added while others decode: the window path must keep
    decode tokens flowing and produce full-length outputs."""
    llm = _mk_llm(tiny_llama_dir)
    engine = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    done = {}
    engine.add_request("r0", "warm up prompt", sp)
    # let r0 reach decode
    for _ in range(2):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
    engine.add_request("r1", "second prompt arriving late " * 3, sp)
    engine.add_request("r2", "third " * 3, sp)
    for _ in range(200):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
        if len(done) == 3:
            break
    assert len(done) == 3
    for rid, out in done.items():
        assert len(out.outputs[0].token_ids) == 12, rid
    assert any(k[0] == "decode_multi_mixed"
               for k in _runner(llm)._fns)


def test_mixed_window_seeded_sampling_conforms(tiny_llama_dir):
    """Seeded stochastic rows through the mixed window reproduce."""
    llm = _mk_llm(tiny_llama_dir)
    sp = SamplingParams(temperature=1.0, seed=11, max_tokens=10,
                        ignore_eos=True)
    a = llm.generate(PROMPTS[:3], sp)
    b = llm.generate(PROMPTS[:3], sp)
    for x, y in zip(a, b):
        assert list(x.outputs[0].token_ids) == list(y.outputs[0].token_ids)


def test_mixed_window_packs_multiple_prompts(tiny_llama_dir):
    """Several short prompts arriving while decodes run must share ONE
    fused window (round-5 multi-prompt lanes), not trickle one per
    window."""
    llm = _mk_llm(tiny_llama_dir)
    engine = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    done = {}
    engine.add_request("w0", "warm prompt", sp)
    for _ in range(2):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
    for i in range(4):  # four tiny prompts, all waiting at once
        engine.add_request(f"s{i}", f"tiny {i}", sp)
    for _ in range(120):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
        if len(done) == 5:
            break
    assert len(done) == 5
    for rid, out in done.items():
        assert len(out.outputs[0].token_ids) == 16, rid
    runner = _runner(llm)
    assert getattr(runner, "_mixed_window_max_groups", 0) >= 2, \
        "multiple prompts never packed into one window"


def test_mixed_window_full_cadence_after_prefill(tiny_llama_dir):
    """A prompt completing its prefill inside the window must flip to
    DECODE stage and then emit K tokens per engine step — the round-5
    serving trace caught completing-at-step-0 prompts stuck in PREFILL,
    rescheduled as 1-token chunks emitting one token per window."""
    llm = _mk_llm(tiny_llama_dir)
    engine = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    engine.add_request("warm", "warm", sp)
    engine.step()  # warm decode exists so the window engages for r1
    engine.add_request("r1", "short", sp)  # completes at iteration 0
    steps = 0
    done = 0
    for _ in range(60):
        steps += 1
        for out in engine.step():
            if out.finished:
                done += 1
        if done == 2:
            break
    assert done == 2
    # 40 tokens at K=4 => ~10 windows + prefill + slack. The stuck-stage
    # bug took 40+ steps (one token per window).
    assert steps <= 11 + 6, f"cadence collapsed: {steps} steps"
