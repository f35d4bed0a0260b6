"""Pallas TPU attention kernels.

Decode: a block-table-driven paged-attention kernel (the TPU-native
equivalent of csrc/attention/attention_kernels.cu paged_attention_v1/v2 and
the reference TPU port's torch.ops.xla.paged_attention, pallas.py:199).
Design:
- grid (batch,): one program per sequence; TPU megacore splits the batch.
- the KV cache stays in HBM; each program DMAs only ITS sequence's pages
  (PAGES_PER_CHUNK at a time, double-buffered) into VMEM — per-step KV
  traffic is bounded by the batch's actual context, not max_model_len.
- online-softmax (flash) accumulation in fp32 carries; GQA queries are
  grouped per kv-head and never materialize repeated KV.
- fp8 KV dequant fuses into the same pass (the reference TPU backend could
  not do FP8 KV at all, pallas.py:109-110).

Prefill currently delegates to the XLA reference implementation (fuses
well); the decode path is where block-table gathers dominated.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_magic_vllm_tpu.ops.attention import (decode_attention_ref,
                                                 prefill_attention_ref)

prefill_attention = prefill_attention_ref

PAGES_PER_CHUNK = 8


def _decode_kernel(tables_ref, ctx_ref, win_ref, q_ref, k_hbm, v_hbm,
                   o_ref, k_buf, v_buf, sems, *, kvh: int, group: int,
                   bs: int, hd: int, n_chunks: int, ppc: int,
                   kv_scale: float, logit_cap: Optional[float],
                   alibi_slopes=None):
    b = pl.program_id(0)
    ctx = ctx_ref[b]
    window = win_ref[0]
    n_pages_needed = (ctx + bs - 1) // bs
    needed_chunks = (n_pages_needed + ppc - 1) // ppc
    # sliding window: chunks entirely before (ctx - window) are skipped
    first_valid = jnp.maximum(ctx - window, 0)
    first_chunk = first_valid // (ppc * bs)

    def start_chunk(c, slot):
        for p in range(ppc):  # ppc is small and static
            page = tables_ref[b, c * ppc + p]
            # page-major layout: one page = one contiguous [kvh, bs, hd] DMA
            pltpu.make_async_copy(k_hbm.at[page], k_buf.at[slot, p],
                                  sems.at[slot, p, 0]).start()
            pltpu.make_async_copy(v_hbm.at[page], v_buf.at[slot, p],
                                  sems.at[slot, p, 1]).start()

    def wait_chunk(slot):
        for p in range(ppc):
            pltpu.make_async_copy(k_hbm.at[0], k_buf.at[slot, p],
                                  sems.at[slot, p, 0]).wait()
            pltpu.make_async_copy(v_hbm.at[0], v_buf.at[slot, p],
                                  sems.at[slot, p, 1]).wait()

    start_chunk(first_chunk, 0)
    q = q_ref[0].astype(jnp.float32)  # [nqh, hd]

    T = ppc * bs
    m0 = jnp.full((kvh, group, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh, group, 1), jnp.float32)
    acc0 = jnp.zeros((kvh, group, hd), jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c - first_chunk, 2)

        @pl.when(c + 1 < needed_chunks)
        def _():
            start_chunk(c + 1, jax.lax.rem(c + 1 - first_chunk, 2))

        wait_chunk(slot)
        # [1, ppc, kvh, bs, hd]; per-head slices below avoid a transpose
        # relayout (merging leading dims is free).
        kc = k_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        vc = v_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        pos = c * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        valid = (pos < ctx) & (pos >= first_valid)  # [1, T]

        # ONE batched dot over all kv heads (vs a python per-head loop of
        # [group, T] dots): k/v relayout to [kvh, T, hd] is a sublane swap
        # the MXU win pays for
        k_all = jnp.swapaxes(kc, 0, 1).reshape(kvh, T, hd).astype(
            jnp.float32)
        v_all = jnp.swapaxes(vc, 0, 1).reshape(kvh, T, hd).astype(
            jnp.float32)
        if kv_scale != 1.0:
            k_all = k_all * kv_scale
            v_all = v_all * kv_scale
        q3 = q.reshape(kvh, group, hd)
        s = jax.lax.dot_general(
            q3, k_all, (((2, ), (2, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [kvh, group, T]
        if logit_cap is not None and logit_cap > 0:
            s = jnp.tanh(s / logit_cap) * logit_cap
        if alibi_slopes is not None:
            # static python-float slopes: scalar constants only
            # (pallas rejects captured array constants)
            rel = (pos - (ctx - 1)).astype(jnp.float32)  # [1, T]
            s = s + jnp.concatenate([
                float(alibi_slopes[h]) * rel for h in range(kvh * group)
            ], axis=0).reshape(kvh, group, T)
        s = jnp.where(valid[None], s, -jnp.inf)
        chunk_m = jnp.max(s, axis=-1, keepdims=True)  # [kvh, group, 1]
        new_m = jnp.maximum(m, chunk_m)
        # guard -inf - -inf when a chunk is fully masked
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p_ = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        new_l = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_, v_all, (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [kvh, group, hd]
        new_acc = acc * alpha + pv
        return (new_m, new_l, new_acc)

    m, l, acc = jax.lax.fori_loop(first_chunk, needed_chunks, body,
                                  (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)  # [kvh, group, hd]
    o_ref[0] = out.reshape(kvh * group, hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale",
                                             "logit_cap", "alibi_slopes"))
def _decode_attention_pallas(q, k_cache, v_cache, block_tables,
                             context_lens, window=None, *, scale: float,
                             kv_scale: float = 1.0,
                             logit_cap: Optional[float] = None,
                             alibi_slopes=None):
    B, nqh, hd = q.shape
    nb, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    W = block_tables.shape[1]
    ppc = PAGES_PER_CHUNK
    if W % ppc != 0:
        pad = ppc - W % ppc
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        W += pad
    n_chunks = W // ppc

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _decode_kernel, kvh=kvh, group=group, bs=bs, hd=hd,
        n_chunks=n_chunks, ppc=ppc, kv_scale=kv_scale, logit_cap=logit_cap,
        alibi_slopes=alibi_slopes)

    if window is None:
        window = jnp.full((1, ), 2**30, jnp.int32)
    else:
        window = jnp.asarray(window, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, ),
        in_specs=[
            pl.BlockSpec((1, nqh, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nqh, hd), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ppc, kvh, bs, hd), k_cache.dtype),
            pltpu.VMEM((2, ppc, kvh, bs, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, ppc, 2)),
        ],
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nqh, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
        interpret=interpret,
    )(block_tables, context_lens, window, q_scaled, k_cache, v_cache)
    return out


def decode_attention(q, k_cache, v_cache, block_tables, context_lens, *,
                     scale: float, sliding_window: Optional[int] = None,
                     logit_cap: Optional[float] = None,
                     kv_scale: float = 1.0, alibi_slopes=None):
    """Paged decode attention; sliding windows (static or traced
    per-layer scalars, e.g. gemma2 alternation) ride the scalar-prefetch
    channel; ALiBi slopes are static per-head constants baked into the
    kernel. XLA reference fallback only for odd head sizes / tiny
    blocks."""
    nb, kvh, bs, hd = k_cache.shape
    nqh = q.shape[1]
    if hd % 128 != 0 or nqh % kvh != 0 or bs % 8 != 0:
        return decode_attention_ref(q, k_cache, v_cache, block_tables,
                                    context_lens, scale=scale,
                                    sliding_window=sliding_window,
                                    logit_cap=logit_cap,
                                    alibi_slopes=alibi_slopes)
    return _decode_attention_pallas(q, k_cache, v_cache, block_tables,
                                    context_lens, window=sliding_window,
                                    scale=scale, kv_scale=kv_scale,
                                    logit_cap=logit_cap,
                                    alibi_slopes=alibi_slopes)
