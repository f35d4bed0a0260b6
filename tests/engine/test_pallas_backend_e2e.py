"""Engine e2e with the PALLAS attention backend (interpret mode on CPU):
greedy tokens must exactly match the jnp reference backend.

Regression for the block-table-width contract: the Pallas context-prefill
kernel reads the current chunk's KV back through the block table, so the
driver must size prefill table rows to span context + chunk (caught by
code review; CPU engine tests previously only ever ran the jnp backend,
so a driver/kernel metadata mismatch could ship silently)."""
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from tests.utils import create_tiny_llama_checkpoint

# prompts chosen to cross several 16-token blocks (width bucket > 1) and
# to share a prefix for the prefix-cache-hit path
_LONG = list(range(1, 101))                     # 100 tokens, 7 blocks
_SHARED = _LONG[:64] + [200, 201, 202]          # prefix-cache continuation
_PROMPTS = [_LONG, _SHARED, [1, 5, 9]]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    # head_dim must be 128 so the Pallas context-prefill kernel is
    # actually selected (smaller heads fall back to the jnp reference
    # and would not regression-test the kernel contract)
    d = tmp_path_factory.mktemp("pallas_e2e") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=512,
                                        intermediate_size=256,
                                        num_hidden_layers=2,
                                        num_attention_heads=4,
                                        num_key_value_heads=2)


def _greedy(model_dir, backend, sequential=False, **kw):
    import os
    os.environ["NMV_TPU_ATTENTION_BACKEND"] = backend
    try:
        from neural_magic_vllm_tpu import LLM, SamplingParams
        llm = LLM(model=model_dir, dtype="float32", max_model_len=256,
                  block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
                  enforce_eager=True, disable_log_stats=True, **kw)
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                            detokenize=False)
        if sequential:
            # one request at a time, so later prompts actually HIT the
            # prefix cache blocks computed by earlier ones
            return [list(llm.generate(prompt_token_ids=[p],
                                      sampling_params=sp,
                                      use_tqdm=False)[0]
                         .outputs[0].token_ids) for p in _PROMPTS]
        outs = llm.generate(prompt_token_ids=_PROMPTS, sampling_params=sp,
                            use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]
    finally:
        del os.environ["NMV_TPU_ATTENTION_BACKEND"]


def test_pallas_backend_matches_ref(ckpt):
    assert _greedy(ckpt, "pallas") == _greedy(ckpt, "jnp")


def test_pallas_backend_matches_ref_prefix_caching(ckpt):
    kw = dict(enable_prefix_caching=True, sequential=True)
    assert _greedy(ckpt, "pallas", **kw) == _greedy(ckpt, "jnp", **kw)


def test_pallas_backend_matches_ref_chunked_prefill(ckpt):
    kw = dict(enable_chunked_prefill=True, max_num_batched_tokens=32)
    assert _greedy(ckpt, "pallas", **kw) == _greedy(ckpt, "jnp", **kw)
