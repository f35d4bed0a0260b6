"""Paged attention over the block-table KV cache.

TPU-native replacement for the reference attention stack
(csrc/attention/attention_kernels.cu paged_attention_v1/v2 and
vllm/attention/backends/*). Two entry points:

- ``prefill_attention``: one sequence's (chunk of) prompt tokens attending to
  already-cached context (prefix-cache hits / earlier chunks, read through the
  block table) plus causally to the current chunk. Covers fresh prefill
  (context_len=0), chunked prefill, and prefix-cache continuation — the three
  paths the reference splits across flash_attn_varlen / context_attention_fwd
  (vllm/attention/backends/flash_attn.py:317-352).
- ``decode_attention``: batched single-token queries over the paged cache
  (reference paged_attention_v1/v2).

This module holds the pure-jnp reference implementations; they are jittable,
static-shape, and correct everywhere (CPU tests, TPU). The Pallas kernels in
ops/pallas_attention.py implement the same contracts and are selected by
``get_attention_backend``. GQA never materializes repeated KV heads: queries
are reshaped to [kv_head, group] and contracted per kv-head.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _soft_cap(scores: jax.Array, logit_cap: Optional[float]) -> jax.Array:
    if logit_cap is not None and logit_cap > 0:
        scores = jnp.tanh(scores / logit_cap) * logit_cap
    return scores


def get_alibi_slopes(n_heads: int):
    """Standard ALiBi per-head slopes (Press et al.; matches HF
    build_alibi_tensor / the reference's alibi plumbing in
    bloom.py/mpt.py/baichuan.py). Returns a tuple of python floats —
    static, baked into the kernels."""
    import math
    closest = 2**math.floor(math.log2(n_heads))
    base = 2.0**(-(2.0**-(math.log2(closest) - 3)))
    slopes = [base**(i + 1) for i in range(closest)]
    if closest != n_heads:
        extra_base = 2.0**(-(2.0**-(math.log2(2 * closest) - 3)))
        extra = [extra_base**(i + 1) for i in range(2 * closest)][0::2]
        slopes += extra[:n_heads - closest]
    return tuple(slopes)


def _slopes_arr(alibi_slopes, kvh: int, group: int) -> jax.Array:
    return jnp.asarray(alibi_slopes, jnp.float32).reshape(kvh, group)


def _blocksparse_allow(q_pos: jax.Array, k_pos: jax.Array, kvh: int,
                       group: int, blocksparse) -> jax.Array:
    """Phi-3-Small vertical-stride block sparsity (reference
    blocksparse_attention/utils.py:141-199): block (qb, kb) of head h is
    kept when qb - kb < local_blocks OR (kb + h*step + 1) % vert_stride == 0
    (step = 0 for homo heads else max(1, vert_stride // n_heads)); causal
    masking is applied separately by the caller.

    q_pos/k_pos broadcast to [Q, K]; returns [kvh, group, Q, K] bool."""
    block_size, local_blocks, vert_stride, homo = blocksparse
    qb = q_pos // block_size
    kb = k_pos // block_size
    local = (qb - kb) < local_blocks  # [Q, K]
    nqh = kvh * group
    step = 0 if homo else max(1, vert_stride // nqh)
    h = jnp.arange(nqh, dtype=jnp.int32).reshape(kvh, group, 1, 1)
    vert = (kb[None, None] + h * step + 1) % vert_stride == 0
    return local[None, None] | vert


def prefill_attention_ref(
    q: jax.Array,  # [S, num_q_heads, head_dim]
    k: jax.Array,  # [S, num_kv_heads, head_dim] (current chunk)
    v: jax.Array,  # [S, num_kv_heads, head_dim]
    k_cache: jax.Array,  # [num_blocks, kvh, block_size, hd]
    v_cache: jax.Array,
    block_table: jax.Array,  # [max_blocks] int32
    context_len: jax.Array,  # scalar int32: cached tokens before this chunk
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    alibi_slopes=None,  # static tuple[num_q_heads] of floats
    blocksparse=None,  # static (block_size, local_blocks, vert_stride, homo)
) -> jax.Array:
    """Returns [S, num_q_heads, head_dim]. Query position of row i is
    context_len + i; causal within the chunk, full attention to the cached
    context (masked to j < context_len)."""
    S, nqh, hd = q.shape
    kvh = k_cache.shape[1]
    group = nqh // kvh
    bs = k_cache.shape[2]
    max_ctx = block_table.shape[0] * bs

    # Gather context pages: [max_blocks, kvh, bs, hd] -> [kvh, max_ctx, hd]
    ctx_k = k_cache[block_table].transpose(1, 0, 2, 3).reshape(
        kvh, max_ctx, hd)
    ctx_v = v_cache[block_table].transpose(1, 0, 2, 3).reshape(
        kvh, max_ctx, hd)

    qg = q.reshape(S, kvh, group, hd).astype(jnp.float32)
    # context scores: [S, kvh, group, max_ctx]
    ctx_scores = jnp.einsum("skgh,kch->skgc", qg,
                            ctx_k.astype(jnp.float32)) * scale
    # current-chunk scores: [S, kvh, group, S]
    cur_scores = jnp.einsum("skgh,tkh->skgt", qg,
                            k.astype(jnp.float32)) * scale
    ctx_scores = _soft_cap(ctx_scores, logit_cap)
    cur_scores = _soft_cap(cur_scores, logit_cap)

    q_pos = context_len + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    ctx_pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_ctx), 1)
    cur_pos = context_len + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    if alibi_slopes is not None:
        sl = _slopes_arr(alibi_slopes, kvh, group)  # [kvh, group]
        ctx_scores = ctx_scores + sl[None, :, :, None] * \
            (ctx_pos - q_pos).astype(jnp.float32)[:, None, None, :]
        cur_scores = cur_scores + sl[None, :, :, None] * \
            (cur_pos - q_pos).astype(jnp.float32)[:, None, None, :]

    ctx_mask = ctx_pos < context_len  # [1, max_ctx] valid context
    cur_mask = cur_pos <= q_pos  # [S, S] causal
    if sliding_window is not None:
        ctx_mask = ctx_mask & (q_pos - ctx_pos < sliding_window)
        cur_mask = cur_mask & (q_pos - cur_pos < sliding_window)
    else:
        ctx_mask = jnp.broadcast_to(ctx_mask, (S, max_ctx))

    ctx_scores = jnp.where(ctx_mask[:, None, None, :], ctx_scores, _NEG_INF)
    cur_scores = jnp.where(cur_mask[:, None, None, :], cur_scores, _NEG_INF)
    if blocksparse is not None:
        allow_ctx = _blocksparse_allow(q_pos, ctx_pos, kvh, group,
                                       blocksparse).transpose(2, 0, 1, 3)
        allow_cur = _blocksparse_allow(q_pos, cur_pos, kvh, group,
                                       blocksparse).transpose(2, 0, 1, 3)
        ctx_scores = jnp.where(allow_ctx, ctx_scores, _NEG_INF)
        cur_scores = jnp.where(allow_cur, cur_scores, _NEG_INF)

    scores = jnp.concatenate([ctx_scores, cur_scores], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx_probs, cur_probs = probs[..., :max_ctx], probs[..., max_ctx:]
    out = jnp.einsum("skgc,kch->skgh", ctx_probs,
                     ctx_v.astype(jnp.float32))
    out += jnp.einsum("skgt,tkh->skgh", cur_probs, v.astype(jnp.float32))
    return out.reshape(S, nqh, hd).astype(q.dtype)


def decode_attention_ref(
    q: jax.Array,  # [B, num_q_heads, head_dim]
    k_cache: jax.Array,  # [num_blocks, kvh, bs, hd]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32
    context_lens: jax.Array,  # [B] int32: total tokens incl. current
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    alibi_slopes=None,
    blocksparse=None,  # static (block_size, local_blocks, vert_stride, homo)
) -> jax.Array:
    """Returns [B, num_q_heads, head_dim]. The current token's KV must
    already be written to the cache (write-then-attend, like the reference
    decode path)."""
    B, nqh, hd = q.shape
    _, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    max_ctx = block_tables.shape[1] * bs

    def one(qb, bt, ctx_len):
        keys = k_cache[bt].transpose(1, 0, 2, 3).reshape(kvh, max_ctx, hd)
        vals = v_cache[bt].transpose(1, 0, 2, 3).reshape(kvh, max_ctx, hd)
        qg = qb.reshape(kvh, group, hd).astype(jnp.float32)
        scores = jnp.einsum("kgh,kch->kgc", qg,
                            keys.astype(jnp.float32)) * scale
        scores = _soft_cap(scores, logit_cap)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, max_ctx), 2)
        if alibi_slopes is not None:
            sl = _slopes_arr(alibi_slopes, kvh, group)
            scores = scores + sl[:, :, None] * \
                (pos - (ctx_len - 1)).astype(jnp.float32)
        mask = pos < ctx_len
        if sliding_window is not None:
            mask = mask & (ctx_len - 1 - pos < sliding_window)
        scores = jnp.where(mask, scores, _NEG_INF)
        if blocksparse is not None:
            allow = _blocksparse_allow(
                jnp.reshape(ctx_len - 1, (1, 1)),
                jax.lax.broadcasted_iota(jnp.int32, (1, max_ctx), 1), kvh,
                group, blocksparse).reshape(kvh, group, max_ctx)
            scores = jnp.where(allow, scores, _NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("kgc,kch->kgh", probs, vals.astype(jnp.float32))
        return out.reshape(nqh, hd).astype(q.dtype)

    return jax.vmap(one)(q, block_tables, context_lens)


def segment_prefill_attention_ref(
    q: jax.Array,  # [T, num_q_heads, head_dim] (multiple seqs, flat)
    k: jax.Array,  # [T, num_kv_heads, head_dim]
    v: jax.Array,
    seq_ids: jax.Array,  # [T] int32 segment id per token (-1 = padding)
    q_pos: jax.Array,  # [T] int32 position of each token in its sequence
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    alibi_slopes=None,
    blocksparse=None,  # static (block_size, local_blocks, vert_stride, homo)
) -> jax.Array:
    """Ragged batched prefill for CONTEXT-FREE prompts: several sequences
    concatenated into one flat token axis, isolated by a segment mask
    (same-sequence AND causal). This is how fresh prefills batch on TPU —
    one weight pass serves every prompt, where the reference's TPU port ran
    prefill one sequence per dispatch (tpu_model_runner.py:485-496)."""
    T, nqh, hd = q.shape
    kvh = k.shape[1]
    group = nqh // kvh

    qg = q.reshape(T, kvh, group, hd).astype(jnp.float32)
    scores = jnp.einsum("ikgh,jkh->ikgj", qg,
                        k.astype(jnp.float32)) * scale
    scores = _soft_cap(scores, logit_cap)
    if alibi_slopes is not None:
        sl = _slopes_arr(alibi_slopes, kvh, group)
        rel = (q_pos[None, :] - q_pos[:, None]).astype(jnp.float32)
        scores = scores + sl[None, :, :, None] * rel[:, None, None, :]
    same = (seq_ids[:, None] == seq_ids[None, :]) & (seq_ids[:, None] >= 0)
    causal = q_pos[None, :] <= q_pos[:, None]
    mask = same & causal
    if sliding_window is not None:
        mask = mask & (q_pos[:, None] - q_pos[None, :] < sliding_window)
    scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
    if blocksparse is not None:
        allow = _blocksparse_allow(q_pos[:, None], q_pos[None, :], kvh,
                                   group, blocksparse).transpose(2, 0, 1, 3)
        scores = jnp.where(allow, scores, _NEG_INF)
    # fully-masked (padding) rows: make softmax well-defined
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.any(mask, axis=1)[:, None, None, None], probs,
                      0.0)
    out = jnp.einsum("ikgj,jkh->ikgh", probs, v.astype(jnp.float32))
    return out.reshape(T, nqh, hd).astype(q.dtype)


def get_attention_backend(backend: Optional[str] = None):
    """Select (prefill_fn, decode_fn). "pallas" on TPU, "jnp" reference
    otherwise; override via NMV_TPU_ATTENTION_BACKEND
    (the reference's selector seam, vllm/attention/selector.py:93)."""
    from neural_magic_vllm_tpu import envs
    backend = backend or envs.NMV_TPU_ATTENTION_BACKEND
    if backend is None:
        backend = "pallas" if jax.default_backend() in ("tpu",
                                                        "axon") else "jnp"
    if backend == "pallas":
        from neural_magic_vllm_tpu.ops import pallas_attention
        return (pallas_attention.prefill_attention,
                pallas_attention.decode_attention)
    if backend == "null":
        # PROFILING ONLY: skip attention math/page DMAs (KV writes still
        # happen upstream). Output is garbage; used by
        # benchmarks/decode_profile.py to isolate attention cost by
        # subtraction.
        def _null_prefill(q, k, v, *a, **kw):
            return q
        def _null_decode(q, *a, **kw):
            return q
        return _null_prefill, _null_decode
    return prefill_attention_ref, decode_attention_ref
