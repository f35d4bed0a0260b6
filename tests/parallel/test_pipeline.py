"""In-graph GPipe pipeline parallelism: PipelinedModel.forward over a
pp=4 (and pp=2 x tp=2) CPU mesh must exactly match the plain
single-device forward, for decode batches, microbatched (chunked)
single-sequence prefill, and ragged batched prefill; KV caches must end
up identical."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from neural_magic_vllm_tpu.layers.attention import AttentionMetadata


def _build_model():
    from transformers import LlamaConfig
    from neural_magic_vllm_tpu.config import ModelConfig
    from neural_magic_vllm_tpu.models import get_model_class
    hf = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=4, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=256,
                     torch_dtype="float32")
    hf.architectures = ["LlamaForCausalLM"]
    mc = ModelConfig(model="__inline__", tokenizer="__inline__",
                     dtype="float32", max_model_len=256, hf_config=hf,
                     skip_tokenizer_init=True)
    model = get_model_class(["LlamaForCausalLM"])(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _kv(L=4, nb=16, kvh=2, bs=16, hd=16):
    return (jnp.zeros((L, nb, kvh, bs, hd), jnp.float32),
            jnp.zeros((L, nb, kvh, bs, hd), jnp.float32))


@pytest.mark.parametrize("pp,tp", [(4, 1), (2, 2)])
def test_pipelined_model_matches_plain(pp, tp):
    from neural_magic_vllm_tpu.parallel.pipeline import (PipelinedModel,
                                                         build_pp_mesh)
    model, params = _build_model()
    mesh = build_pp_mesh(pp, tp)
    pm = PipelinedModel(model, mesh)

    # --- single-sequence prefill (microbatched == chunked) ----------------
    T = 16
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 256, T), jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)
    meta = AttentionMetadata(
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        block_tables=jnp.arange(4, dtype=jnp.int32)[None, :],
        context_lens=jnp.zeros((1, ), jnp.int32))
    kv = _kv()
    ref_hidden, ref_kv = model.forward(params, tokens, positions, kv,
                                       meta, is_prefill=True)
    kv2 = _kv()
    pp_hidden, pp_kv = pm.forward(params, tokens, positions, kv2,
                                  meta, is_prefill=True)
    np.testing.assert_allclose(np.asarray(pp_hidden),
                               np.asarray(ref_hidden), atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_kv[0]),
                               np.asarray(ref_kv[0]), atol=2e-5, rtol=1e-5)

    # --- decode over the prefilled cache ----------------------------------
    B = 8
    dec_tokens = jnp.asarray(rng.integers(1, 256, B), jnp.int32)
    dec_meta = AttentionMetadata(
        slot_mapping=jnp.full((B, ), T, jnp.int32).at[1:].set(-1),
        block_tables=jnp.tile(jnp.arange(4, dtype=jnp.int32), (B, 1)),
        context_lens=jnp.full((B, ), T + 1, jnp.int32))
    dec_pos = jnp.full((B, ), T, jnp.int32)
    ref_h2, _ = model.forward(params, dec_tokens, dec_pos, ref_kv,
                              dec_meta, is_prefill=False)
    pp_h2, _ = pm.forward(params, dec_tokens, dec_pos, pp_kv,
                          dec_meta, is_prefill=False)
    np.testing.assert_allclose(np.asarray(pp_h2), np.asarray(ref_h2),
                               atol=2e-5, rtol=1e-5)


def test_pipelined_batched_prefill_matches_plain():
    """Ragged batched prefill (seq_ids metadata) runs through PP as one
    microbatch and must match the plain forward exactly."""
    from neural_magic_vllm_tpu.parallel.pipeline import (PipelinedModel,
                                                         build_pp_mesh)
    model, params = _build_model()
    mesh = build_pp_mesh(2, 1)
    pm = PipelinedModel(model, mesh)

    rng = np.random.default_rng(1)
    lens = [5, 11]  # two prompts packed into one flat token stream
    T = sum(lens)
    tokens = jnp.asarray(rng.integers(1, 256, T), jnp.int32)
    positions = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32) for n in lens])
    seq_ids = jnp.concatenate([
        jnp.full((n, ), i, jnp.int32) for i, n in enumerate(lens)])
    # seq 0 -> blocks 0..., seq 1 -> blocks 8...
    slot = jnp.concatenate([
        jnp.arange(lens[0], dtype=jnp.int32),
        8 * 16 + jnp.arange(lens[1], dtype=jnp.int32)])
    meta = AttentionMetadata(
        slot_mapping=slot,
        block_tables=jnp.asarray([[0, 1], [8, 9]], jnp.int32),
        context_lens=jnp.zeros((2, ), jnp.int32),
        seq_ids=seq_ids, q_pos=positions)
    kv = _kv()
    ref_hidden, ref_kv = model.forward(params, tokens, positions, kv,
                                       meta, is_prefill=True)
    kv2 = _kv()
    pp_hidden, pp_kv = pm.forward(params, tokens, positions, kv2,
                                  meta, is_prefill=True)
    np.testing.assert_allclose(np.asarray(pp_hidden),
                               np.asarray(ref_hidden), atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_kv[0]),
                               np.asarray(ref_kv[0]), atol=2e-5, rtol=1e-5)
