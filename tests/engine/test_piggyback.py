"""Piggyback dispatch (prefill-majority unified batch): a prefill-heavy
step runs the batched prefill with the decode rows riding the same
weight stream one step. Tokens must match the separate-dispatch path
exactly (greedy)."""
import pytest

from neural_magic_vllm_tpu import LLM, SamplingParams


def _mk_llm(tiny_llama_dir, **kw):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               block_size=16, num_gpu_blocks_override=192, max_num_seqs=8,
               num_scheduler_steps=4, enable_chunked_prefill=True,
               max_num_batched_tokens=128, enforce_eager=True, **kw)


def _runner(llm):
    return llm.llm_engine.model_executor.driver_worker.model_runner


SP = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)


def _drive(llm):
    engine = llm.llm_engine
    done = {}
    engine.add_request("w0", "warm prompt", SP)
    engine.add_request("w1", "second warm", SP)
    for _ in range(2):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
    # several fresh prompts while w0/w1 decode -> prefill-heavy steps
    for i in range(4):
        engine.add_request(f"p{i}", f"fresh prompt number {i} words", SP)
    for _ in range(120):
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out
        if len(done) == 6:
            break
    assert len(done) == 6
    return {rid: list(o.outputs[0].token_ids) for rid, o in done.items()}


def test_piggyback_matches_separate(tiny_llama_dir, monkeypatch):
    monkeypatch.setenv("NMV_TPU_MIXED_WINDOW_MIN_DECODE", "64")
    llm = _mk_llm(tiny_llama_dir)
    with_pb = _drive(llm)
    assert any(k[0] == "prefill_batch_decode" for k in _runner(llm)._fns), \
        "piggyback dispatch never engaged"
    for toks in with_pb.values():
        assert len(toks) == 20

    monkeypatch.setenv("NMV_TPU_MIXED_PREFILL_WINDOW", "0")
    llm2 = _mk_llm(tiny_llama_dir)
    plain = _drive(llm2)
    assert not any(k[0] == "prefill_batch_decode"
                   for k in _runner(llm2)._fns)
    assert with_pb == plain
