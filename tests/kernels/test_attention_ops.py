"""Attention op tests: paged prefill/decode vs a dense full-attention oracle
(modeled on reference tests/kernels/test_attention.py which checks CUDA
kernels against a naive torch implementation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_magic_vllm_tpu.ops.attention import (decode_attention_ref,
                                                 prefill_attention_ref)
from neural_magic_vllm_tpu.ops.kv_cache import write_kv


def dense_attention(q, k, v, *, scale, causal_offset=0):
    """Oracle: full attention of q (positions offset..offset+S) over k/v
    (positions 0..L), causal."""
    S, nqh, hd = q.shape
    L, kvh, _ = k.shape
    group = nqh // kvh
    k_rep = np.repeat(k, group, axis=1)
    v_rep = np.repeat(v, group, axis=1)
    scores = np.einsum("sqh,lqh->qsl", q.astype(np.float64),
                       k_rep.astype(np.float64)) * scale
    q_pos = np.arange(S)[:, None] + causal_offset
    k_pos = np.arange(L)[None, :]
    mask = k_pos <= q_pos
    scores = np.where(mask[None], scores, -np.inf)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("qsl,lqh->sqh", probs, v_rep.astype(np.float64))


def make_cache(num_blocks, bs, kvh, hd, seed=0):
    rng = np.random.default_rng(seed)
    k_cache = rng.normal(size=(num_blocks, kvh, bs, hd)).astype(np.float32)
    v_cache = rng.normal(size=(num_blocks, kvh, bs, hd)).astype(np.float32)
    return jnp.asarray(k_cache), jnp.asarray(v_cache)


@pytest.mark.parametrize("ctx_len,S", [(0, 8), (5, 8), (16, 3), (30, 16)])
@pytest.mark.parametrize("nqh,kvh", [(4, 4), (4, 2), (8, 1)])
def test_prefill_attention_vs_dense(ctx_len, S, nqh, kvh):
    hd, bs, nb = 16, 4, 32
    rng = np.random.default_rng(42)
    scale = hd**-0.5

    # Context tokens live in the paged cache via a block table.
    ctx_k = rng.normal(size=(ctx_len, kvh, hd)).astype(np.float32)
    ctx_v = rng.normal(size=(ctx_len, kvh, hd)).astype(np.float32)
    k_cache, v_cache = make_cache(nb, bs, kvh, hd)
    n_blocks_used = -(-max(ctx_len, 1) // bs)
    table = rng.choice(nb, size=8, replace=False).astype(np.int32)
    slots = np.array([table[i // bs] * bs + i % bs for i in range(ctx_len)],
                     np.int32)
    if ctx_len:
        k_cache, v_cache = write_kv(k_cache, v_cache, jnp.asarray(ctx_k),
                                    jnp.asarray(ctx_v), jnp.asarray(slots))

    q = rng.normal(size=(S, nqh, hd)).astype(np.float32)
    cur_k = rng.normal(size=(S, kvh, hd)).astype(np.float32)
    cur_v = rng.normal(size=(S, kvh, hd)).astype(np.float32)

    out = prefill_attention_ref(jnp.asarray(q), jnp.asarray(cur_k),
                                jnp.asarray(cur_v), k_cache, v_cache,
                                jnp.asarray(table),
                                jnp.int32(ctx_len), scale=scale)

    k_all = np.concatenate([ctx_k, cur_k], 0)
    v_all = np.concatenate([ctx_v, cur_v], 0)
    expected = dense_attention(q, k_all, v_all, scale=scale,
                               causal_offset=ctx_len)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("nqh,kvh", [(4, 4), (8, 2)])
@pytest.mark.parametrize("ctx_lens", [[1, 5, 16, 31]])
def test_decode_attention_vs_dense(nqh, kvh, ctx_lens):
    hd, bs, nb = 16, 4, 64
    B = len(ctx_lens)
    max_blocks = 8
    rng = np.random.default_rng(7)
    scale = hd**-0.5
    k_cache, v_cache = make_cache(nb, bs, kvh, hd, seed=1)

    tables = np.zeros((B, max_blocks), np.int32)
    all_k, all_v = [], []
    next_block = 0
    for b, L in enumerate(ctx_lens):
        seq_k = rng.normal(size=(L, kvh, hd)).astype(np.float32)
        seq_v = rng.normal(size=(L, kvh, hd)).astype(np.float32)
        nblk = -(-L // bs)
        blocks = np.arange(next_block, next_block + nblk, dtype=np.int32)
        next_block += nblk
        tables[b, :nblk] = blocks
        slots = np.array([blocks[i // bs] * bs + i % bs for i in range(L)],
                         np.int32)
        k_cache, v_cache = write_kv(k_cache, v_cache, jnp.asarray(seq_k),
                                    jnp.asarray(seq_v), jnp.asarray(slots))
        all_k.append(seq_k)
        all_v.append(seq_v)

    q = rng.normal(size=(B, nqh, hd)).astype(np.float32)
    out = decode_attention_ref(jnp.asarray(q), k_cache, v_cache,
                               jnp.asarray(tables),
                               jnp.asarray(ctx_lens, dtype=np.int32),
                               scale=scale)

    for b, L in enumerate(ctx_lens):
        expected = dense_attention(q[b:b + 1], all_k[b], all_v[b],
                                   scale=scale, causal_offset=L - 1)
        np.testing.assert_allclose(np.asarray(out[b:b + 1]), expected,
                                   rtol=2e-4, atol=2e-4)


def test_write_kv_drops_padded_slots():
    k_cache, v_cache = make_cache(4, 4, 2, 8)
    before = np.asarray(k_cache).copy()
    key = jnp.ones((3, 2, 8), jnp.float32)
    val = jnp.ones((3, 2, 8), jnp.float32)
    slots = jnp.asarray([-1, 5, -1], jnp.int32)
    k2, v2 = write_kv(k_cache, v_cache, key, val, slots)
    k2 = np.asarray(k2).copy()
    # only slot 5 (block 1, offset 1) changed
    assert np.allclose(k2[1, :, 1], 1.0)
    k2[1, :, 1] = before[1, :, 1]
    assert np.allclose(k2, before)
