"""Aborted/finished requests must purge the worker's per-request host
caches (draft bookkeeping, spec hidden, multimodal embeddings) via
ExecuteModelRequest.finished_request_ids (reference
finished_requests_ids role) — regression for unbounded growth on client
disconnects."""
from tests.utils import create_tiny_llama_checkpoint


def test_abort_purges_draft_bookkeeping(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from neural_magic_vllm_tpu import LLM, SamplingParams
    tgt = create_tiny_llama_checkpoint(str(tmp_path / "t"), hidden_size=64,
                                       intermediate_size=128,
                                       num_hidden_layers=2)
    dr = create_tiny_llama_checkpoint(str(tmp_path / "d"), hidden_size=32,
                                      intermediate_size=64,
                                      num_hidden_layers=2,
                                      num_attention_heads=2,
                                      num_key_value_heads=2, seed=7)
    llm = LLM(model=tgt, dtype="float32", max_model_len=128, block_size=16,
              num_gpu_blocks_override=96, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              speculative_model=dr, num_speculative_tokens=3)
    eng = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True,
                        detokenize=False)
    eng.add_request("a", prompt_token_ids=[1, 5, 9, 2], sampling_params=sp)
    eng.add_request("b", prompt_token_ids=[1, 7, 3], sampling_params=sp)
    for _ in range(4):
        eng.step()
    runner = eng.model_executor.driver_worker.model_runner
    before = set(runner._draft_seen)
    assert before
    eng.abort_request("a")
    for _ in range(3):
        eng.step()
    assert len(runner._draft_seen) < len(before)
    # drain the rest: everything finished -> all bookkeeping gone
    while eng.has_unfinished_requests():
        eng.step()
    eng.step()  # one more step delivers the final finished-ids batch
    assert not runner._draft_seen or set(runner._draft_seen) < before
