"""Attention layer facade (analogue of reference vllm/attention/layer.py +
backends/abstract.py): writes KV to the paged cache, then dispatches to the
prefill or decode attention op."""
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.attention import get_attention_backend
from neural_magic_vllm_tpu.ops.kv_cache import (KVCache, write_kv,
                                                 write_kv_flat)


class AttentionMetadata(NamedTuple):
    """Per-step attention inputs (reference AttentionMetadata,
    vllm/attention/backends/abstract.py:59). All arrays are padded to the
    step's static bucket.

    prefill: slot_mapping [S]; block_tables [1, maxb]; context_lens [1]
    batched prefill (context-free): + seq_ids [S], q_pos [S]
    decode:  slot_mapping [B]; block_tables [B, maxb]; context_lens [B]
             (context_lens counts all tokens incl. the one being decoded)
    """
    slot_mapping: jax.Array
    block_tables: jax.Array
    context_lens: jax.Array
    # ragged batched prefill only: segment id and in-sequence position of
    # each flat token (None selects the single-sequence prefill path)
    seq_ids: Optional[jax.Array] = None
    q_pos: Optional[jax.Array] = None
    # stateful (mamba) models only: recurrent-state slot per sequence
    # (prefill: [1]; decode: [B], padded rows OOB -> writes dropped)
    state_slots: Optional[jax.Array] = None
    # mixed fused window (decode rows + one prefill chunk in the SAME
    # forward; worker decode_multi_mixed): rows [:B] are decode
    # (block_tables/context_lens as usual, B = context_lens.shape[0]),
    # rows [B:] are one sequence's prefill chunk attending to its cached
    # context through p_block_tables [1, W] with p_context_lens [1]
    # cached-tokens-before-chunk. slot_mapping covers ALL rows.
    p_block_tables: Optional[jax.Array] = None
    p_context_lens: Optional[jax.Array] = None


class Attention:
    """One instance per decoder layer."""

    def __init__(
        self,
        num_heads: int,
        head_dim: int,
        num_kv_heads: int,
        scale: float,
        sliding_window: Optional[int] = None,
        logit_cap: Optional[float] = None,
        backend: Optional[str] = None,
        alibi_slopes=None,  # static tuple[num_heads] of per-head slopes
        blocksparse=None,  # static (block_size, local_blocks, vert_stride,
        # homo_head): Phi-3-Small vertical-stride sparsity; forces the jnp
        # reference backend (reference blocksparse_attn.py:410)
    ) -> None:
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.num_kv_heads = num_kv_heads
        self.scale = scale
        self.sliding_window = sliding_window
        self.logit_cap = logit_cap
        self.alibi_slopes = tuple(alibi_slopes) if alibi_slopes is not None \
            else None
        self.blocksparse = tuple(blocksparse) if blocksparse is not None \
            else None
        self._prefill_fn, self._decode_fn = get_attention_backend(backend)
        # blocksparse routes inside the backend: decode AND context
        # prefill run chunk-skipping Pallas kernels; only the batched
        # segment-prefill path keeps the jnp mask fallback (reference
        # runs a dedicated kernel for both phases,
        # backends/blocksparse_attn.py:410)

    def __call__(
        self,
        q: jax.Array,  # [T, num_heads, head_dim]
        k: jax.Array,  # [T, num_kv_heads, head_dim]
        v: jax.Array,
        kv_cache: KVCache,  # layer-FLAT stacks [L*nb, kvh, bs, hd] with
        # layer_id+num_blocks given; plain per-layer caches otherwise
        meta: AttentionMetadata,
        *,
        is_prefill: bool,
        layer_id=None,  # traced scalar layer index into the flat stacks
        num_blocks: int = None,  # blocks per layer (static)
        window=None,  # traced per-layer window (gemma2 alternation);
        # overrides the static sliding_window when given
        kv_scales=None,  # [2] f32 (k_scale, v_scale) for fp8 KV caches
    ) -> Tuple[jax.Array, KVCache]:
        sliding = window if window is not None else self.sliding_window
        if layer_id is None:  # single-layer caches: row 0 of a 1-layer view
            num_blocks = kv_cache[0].shape[0]
            layer_id = jnp.int32(0)
        if kv_scales is not None:
            # fp8 KV with per-tensor scales (reference Fp8KVCacheMethod,
            # fp8.py:563): cache stores k/s_k and v/s_v; the dequant folds
            # algebraically — k_scale into q (scores are bilinear), v_scale
            # into the output — so no kernel support is needed and the
            # CURRENT chunk is passed pre-divided for consistency.
            k_s = kv_scales[0].astype(jnp.float32)
            v_s = kv_scales[1].astype(jnp.float32)
            k = (k.astype(jnp.float32) / k_s).astype(k.dtype)
            v = (v.astype(jnp.float32) / v_s).astype(v.dtype)
            q = (q.astype(jnp.float32) * k_s).astype(q.dtype)
        k_cache, v_cache = write_kv_flat(kv_cache[0], kv_cache[1], k, v,
                                         meta.slot_mapping, layer_id,
                                         num_blocks)
        block_off = layer_id * num_blocks
        if is_prefill and meta.seq_ids is not None:
            if self.alibi_slopes is not None or self.blocksparse is not None:
                from neural_magic_vllm_tpu.ops.attention import \
                    segment_prefill_attention_ref
                out = segment_prefill_attention_ref(
                    q, k, v, meta.seq_ids, meta.q_pos, scale=self.scale,
                    sliding_window=sliding, logit_cap=self.logit_cap,
                    alibi_slopes=self.alibi_slopes,
                    blocksparse=self.blocksparse)
            else:
                from neural_magic_vllm_tpu.ops.pallas_prefill import \
                    segment_prefill_attention
                out = segment_prefill_attention(
                    q, k, v, meta.seq_ids, meta.q_pos, scale=self.scale,
                    sliding_window=sliding, logit_cap=self.logit_cap)
        elif is_prefill:
            kw = {} if self.blocksparse is None else \
                {"blocksparse": self.blocksparse}
            out = self._prefill_fn(q, k, v, k_cache, v_cache,
                                   meta.block_tables[0] + block_off,
                                   meta.context_lens[0],
                                   scale=self.scale,
                                   sliding_window=sliding,
                                   logit_cap=self.logit_cap,
                                   alibi_slopes=self.alibi_slopes, **kw)
        elif meta.seq_ids is not None:
            # piggyback dispatch: rows [:B] decode + rows [B:] a batched
            # context-free prefill SEGMENT (several fresh prompts) in the
            # same forward — the prefill keeps its tokens-per-weight-
            # stream efficiency while the decode batch advances one step
            # instead of stalling (reference unified batch,
            # flash_attn.py:252-367, with prefill majority).
            kw = {} if self.blocksparse is None else \
                {"blocksparse": self.blocksparse}
            B = meta.context_lens.shape[0]
            out_d = self._decode_fn(q[:B], k_cache, v_cache,
                                    meta.block_tables + block_off,
                                    meta.context_lens,
                                    scale=self.scale,
                                    sliding_window=sliding,
                                    logit_cap=self.logit_cap,
                                    alibi_slopes=self.alibi_slopes, **kw)
            if self.alibi_slopes is not None or self.blocksparse is not None:
                from neural_magic_vllm_tpu.ops.attention import \
                    segment_prefill_attention_ref
                out_p = segment_prefill_attention_ref(
                    q[B:], k[B:], v[B:], meta.seq_ids, meta.q_pos,
                    scale=self.scale, sliding_window=sliding,
                    logit_cap=self.logit_cap,
                    alibi_slopes=self.alibi_slopes,
                    blocksparse=self.blocksparse)
            else:
                from neural_magic_vllm_tpu.ops.pallas_prefill import \
                    segment_prefill_attention
                out_p = segment_prefill_attention(
                    q[B:], k[B:], v[B:], meta.seq_ids, meta.q_pos,
                    scale=self.scale, sliding_window=sliding,
                    logit_cap=self.logit_cap)
            out = jnp.concatenate([out_d, out_p], axis=0)
        elif meta.p_block_tables is not None:
            # mixed fused window: decode rows + one prefill chunk share
            # this forward's GEMMs (the whole point: the chunk rides the
            # decode batch's weight stream); attention splits into the
            # paged-decode kernel and the context-prefill kernel.
            # Reference unifies the two phases in one flash_attn launch
            # (vllm/attention/backends/flash_attn.py:252-367) — on TPU the
            # static split is two Pallas calls over the same cache.
            kw = {} if self.blocksparse is None else \
                {"blocksparse": self.blocksparse}
            B = meta.context_lens.shape[0]
            out_d = self._decode_fn(q[:B], k_cache, v_cache,
                                    meta.block_tables + block_off,
                                    meta.context_lens,
                                    scale=self.scale,
                                    sliding_window=sliding,
                                    logit_cap=self.logit_cap,
                                    alibi_slopes=self.alibi_slopes, **kw)
            out_p = self._prefill_fn(q[B:], k[B:], v[B:], k_cache, v_cache,
                                     meta.p_block_tables[0] + block_off,
                                     meta.p_context_lens[0],
                                     scale=self.scale,
                                     sliding_window=sliding,
                                     logit_cap=self.logit_cap,
                                     alibi_slopes=self.alibi_slopes, **kw)
            out = jnp.concatenate([out_d, out_p], axis=0)
        else:
            kw = {} if self.blocksparse is None else \
                {"blocksparse": self.blocksparse}
            out = self._decode_fn(q, k_cache, v_cache,
                                  meta.block_tables + block_off,
                                  meta.context_lens,
                                  scale=self.scale,
                                  sliding_window=sliding,
                                  logit_cap=self.logit_cap,
                                  alibi_slopes=self.alibi_slopes, **kw)
        if kv_scales is not None:
            out = (out.astype(jnp.float32) * v_s).astype(out.dtype)
        return out, (k_cache, v_cache)
