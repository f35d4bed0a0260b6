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

Context prefill (chunked prefill / prefix-cache hits): the same paged
pattern with TQ query rows per program — see _ctx_prefill_kernel below
(reference role: vllm/attention/ops/prefix_prefill.py).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_magic_vllm_tpu.ops.attention import (decode_attention_ref,
                                                 prefill_attention_ref)

PAGES_PER_CHUNK = 8
# Context-prefill streams many query rows per chunk, so deeper chunks
# amortize better than in decode: ppc 16 measured +10% (fresh 2048) and
# +13% (2048 over 2048 cached) vs 8 on chip, while DECODE regresses at 16
# (round-1 sweep: a lone chunk defeats the double buffer at short
# context). Swept in benchmarks/kernels/prefill_tile_sweep.py (r4).
PREFILL_PAGES_PER_CHUNK = 16


def _decode_kernel(tables_ref, ctx_ref, win_ref, q_ref, k_hbm, v_hbm,
                   *rest, kvh: int, group: int,
                   bs: int, hd: int, ppc: int,
                   kv_scale: float, logit_cap: Optional[float],
                   alibi_slopes=None):
    if alibi_slopes is not None:
        slopes_ref, o_ref, k_buf, v_buf, sems = rest
    else:
        o_ref, k_buf, v_buf, sems = rest
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
            # slopes ride a [kvh, group] VMEM input (pallas rejects
            # captured array constants); one broadcast multiply, no
            # per-head materialization
            rel = (pos - (ctx - 1)).astype(jnp.float32)  # [1, T]
            s = s + slopes_ref[...][:, :, None] * rel[None]
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

    # Padded rows may carry context_lens == 0; the kernel's pipelined
    # prologue always starts the first DMA chunk and a zero-chunk row
    # would leave its semaphores signaled for the NEXT grid program
    # (cross-row corruption). Clamp to 1 — the row's own output is
    # garbage either way (same defense as the multiseq variant).
    context_lens = jnp.maximum(context_lens, 1)

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _decode_kernel, kvh=kvh, group=group, bs=bs, hd=hd,
        ppc=ppc, kv_scale=kv_scale, logit_cap=logit_cap,
        alibi_slopes=alibi_slopes)

    if window is None:
        window = jnp.full((1, ), 2**30, jnp.int32)
    else:
        window = jnp.asarray(window, jnp.int32).reshape(1)
    in_specs = [
        pl.BlockSpec((1, nqh, hd), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # k_cache stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q_scaled, k_cache, v_cache]
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(alibi_slopes,
                                  jnp.float32).reshape(kvh, group))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, ),
        in_specs=in_specs,
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
    )(block_tables, context_lens, window, *inputs)
    return out


# --- blocksparse decode (phi3_small vertical-stride sparsity) ----------------
#
# Reference runs a dedicated Triton blocksparse kernel
# (vllm/attention/backends/blocksparse_attn.py:410). TPU design: the paged
# decode loop iterates a PRECOMPUTED per-sequence list of needed page
# chunks — a chunk is skipped when no position in it is visible to ANY
# head (outside the local window and containing no vertical column). At
# phi3_small geometry (sparse block 64, local 16, vert_stride 8) deep
# decode reads ~1/vert_stride of the distant context instead of all of it.
# In-chunk, per-head vertical/local masks are applied before the online
# softmax (heads differ when homo_head_pattern=False).


def _decode_kernel_bsparse(tables_ref, ctx_ref, chunk_idx_ref, nneed_ref,
                           q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sems,
                           *, kvh: int, group: int, bs: int, hd: int,
                           ppc: int, kv_scale: float,
                           logit_cap: Optional[float], sbs: int,
                           local: int, vert: int, step: int):
    b = pl.program_id(0)
    ctx = ctx_ref[b]
    n = nneed_ref[b]
    qb = (ctx - 1) // sbs
    T = ppc * bs

    def start_chunk(c, slot):
        for p in range(ppc):
            page = tables_ref[b, c * ppc + p]
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

    start_chunk(chunk_idx_ref[b, 0], 0)
    q = q_ref[0].astype(jnp.float32)  # [nqh, hd]

    m0 = jnp.full((kvh, group, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh, group, 1), jnp.float32)
    acc0 = jnp.zeros((kvh, group, hd), jnp.float32)
    # q-head index in reference numbering (h = kv_head * group + g)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (kvh, group, 1), 0) * \
        group + jax.lax.broadcasted_iota(jnp.int32, (kvh, group, 1), 1)

    def body(i, carry):
        m, l, acc = carry
        c = chunk_idx_ref[b, i]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _():
            start_chunk(chunk_idx_ref[b, i + 1], jax.lax.rem(i + 1, 2))

        wait_chunk(slot)
        kc = k_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        vc = v_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        pos = c * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        valid = pos < ctx  # [1, T]
        kb = pos // sbs  # [1, T]
        # per-head blocksparse visibility (reference
        # blocksparse_attention/utils.py:141-199)
        allow = ((qb - kb)[None] < local) | \
            (jax.lax.rem(kb[None] + h_idx * step + 1, vert) == 0)

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
        s = jnp.where(valid[None] & allow, s, -jnp.inf)
        chunk_m = jnp.max(s, axis=-1, keepdims=True)
        new_m = jnp.maximum(m, chunk_m)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p_ = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        new_l = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_, v_all, (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)
        new_acc = acc * alpha + pv
        return (new_m, new_l, new_acc)

    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.reshape(kvh * group, hd).astype(o_ref.dtype)


def _bsparse_needed_chunks(context_lens, n_chunks: int, T: int, sbs: int,
                           local: int, vert: int, step: int, nqh: int):
    """Per-sequence ordered list of page chunks any head can see.
    Returns (chunk_idx [B, C] i32 — needed chunks first, ascending —
    and n_needed [B] i32). The vertical-column test reduces to a static
    residue set: (kb + h*step + 1) % vert == 0  <=>  kb % vert in
    {(-(h*step) - 1) mod vert}."""
    residues = sorted({(-(h * step) - 1) % vert for h in range(nqh)})
    B = context_lens.shape[0]
    c = jnp.arange(n_chunks, dtype=jnp.int32)  # [C]
    kb0 = (c * T) // sbs
    kb1 = ((c + 1) * T - 1) // sbs
    ctx = context_lens[:, None]  # [B, 1]
    qb = (ctx - 1) // sbs
    in_ctx = (c[None] * T) < ctx  # [B, C]
    local_overlap = kb1[None] >= (qb - local + 1)  # [B, C]
    # any kb in [kb0, kb1] with kb % vert in residues
    kb_per_chunk = T // sbs + 1
    kbs = kb0[:, None] + jnp.arange(kb_per_chunk, dtype=jnp.int32)[None]
    kb_ok = kbs <= kb1[:, None]  # [C, kbpc]
    vert_hit = jnp.zeros_like(kb_ok)
    for r in residues:
        vert_hit = vert_hit | (jax.lax.rem(kbs, vert) == r)
    any_vert = jnp.any(vert_hit & kb_ok, axis=1)  # [C]
    needed = in_ctx & (local_overlap | any_vert[None])  # [B, C]
    big = jnp.int32(2 ** 30)
    key = jnp.where(needed, c[None], big)
    chunk_idx = jnp.argsort(key, axis=1).astype(jnp.int32)
    n_needed = jnp.sum(needed, axis=1).astype(jnp.int32)
    return chunk_idx, n_needed


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale",
                                             "logit_cap", "blocksparse"))
def _decode_attention_pallas_bsparse(q, k_cache, v_cache, block_tables,
                                     context_lens, *, scale: float,
                                     blocksparse, kv_scale: float = 1.0,
                                     logit_cap: Optional[float] = None):
    B, nqh, hd = q.shape
    nb, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    sbs, local, vert, homo = blocksparse
    step = 0 if homo else max(1, vert // nqh)
    W = block_tables.shape[1]
    ppc = PAGES_PER_CHUNK
    if W % ppc != 0:
        pad = ppc - W % ppc
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        W += pad
    context_lens = jnp.maximum(context_lens, 1)
    T = ppc * bs
    chunk_idx, n_needed = _bsparse_needed_chunks(
        context_lens, W // ppc, T, int(sbs), int(local), int(vert), step,
        nqh)

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _decode_kernel_bsparse, kvh=kvh, group=group, bs=bs, hd=hd,
        ppc=ppc, kv_scale=kv_scale, logit_cap=logit_cap, sbs=int(sbs),
        local=int(local), vert=int(vert), step=step)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, ),
        in_specs=[
            pl.BlockSpec((1, nqh, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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
    )(block_tables, context_lens, chunk_idx, n_needed, q_scaled, k_cache,
      v_cache)
    return out


def decode_attention(q, k_cache, v_cache, block_tables, context_lens, *,
                     scale: float, sliding_window: Optional[int] = None,
                     logit_cap: Optional[float] = None,
                     kv_scale: float = 1.0, alibi_slopes=None,
                     blocksparse=None):
    """Paged decode attention; sliding windows (static or traced
    per-layer scalars, e.g. gemma2 alternation) ride the scalar-prefetch
    channel; ALiBi slopes are static per-head constants baked into the
    kernel. XLA reference fallback only for odd head sizes / tiny
    blocks."""
    nb, kvh, bs, hd = k_cache.shape
    B, nqh, _ = q.shape
    if hd % 128 != 0 or nqh % kvh != 0 or bs % 8 != 0:
        if kv_scale != 1.0:
            # the reference path has no in-kernel fp8 dequant: apply the
            # scale to the (float-upcast) cache instead of dropping it
            k_cache = k_cache.astype(jnp.float32) * kv_scale
            v_cache = v_cache.astype(jnp.float32) * kv_scale
        return decode_attention_ref(q, k_cache, v_cache, block_tables,
                                    context_lens, scale=scale,
                                    sliding_window=sliding_window,
                                    logit_cap=logit_cap,
                                    alibi_slopes=alibi_slopes,
                                    blocksparse=blocksparse)
    if blocksparse is not None:
        return _decode_attention_pallas_bsparse(
            q, k_cache, v_cache, block_tables, context_lens, scale=scale,
            blocksparse=tuple(blocksparse), kv_scale=kv_scale,
            logit_cap=logit_cap)
    from neural_magic_vllm_tpu import envs
    multiseq_max = envs.NMV_TPU_DECODE_MULTISEQ_MAX_BATCH
    if B <= multiseq_max and alibi_slopes is None:
        # small-batch/long-context regime: R sequences share one program
        # (prologue + DMA-pipeline fill amortized; the reference's
        # v2-partitioning role, attention_kernels.cu:89)
        return _decode_attention_multiseq(q, k_cache, v_cache,
                                          block_tables, context_lens,
                                          window=sliding_window,
                                          scale=scale, kv_scale=kv_scale,
                                          logit_cap=logit_cap)
    return _decode_attention_pallas(q, k_cache, v_cache, block_tables,
                                    context_lens, window=sliding_window,
                                    scale=scale, kv_scale=kv_scale,
                                    logit_cap=logit_cap,
                                    alibi_slopes=alibi_slopes)


# --- context-attended prefill (chunked prefill / prefix-cache hits) ----------
#
# The reference has a dedicated 807-LoC Triton kernel for exactly this
# (vllm/attention/ops/prefix_prefill.py; varlen-over-paged-cache path
# flash_attn.py:336-352). TPU-native design: the engine writes the current
# chunk's KV into the paged cache BEFORE attention (write-then-attend,
# layers/attention.py), so cached context and current chunk live in the SAME
# pages — one paged flash loop with per-row causal masking (j <= q_pos)
# covers both. The kernel is the multi-query-row generalization of
# _decode_kernel: grid (q_tiles,), each program owns TQ query rows and
# DMAs the pages its rows can see (double-buffered), skipping chunks
# outside [first row's window, last row's position].


def _pick_q_tile(S: int, nqh: int, kvh: int, hd: int,
                 ppc: int, bs: int, bsparse: bool = False) -> Optional[int]:
    """Largest query tile whose VMEM footprint fits the ~16 MiB budget
    (q/q3/out bf16, acc + scores f32, double-buffered page stage). The
    blocksparse variant materializes one extra [kvh, R, T]-shaped mask
    intermediate in-register."""
    T = ppc * bs
    group = nqh // kvh
    for tq in (256, 128, 64, 32, 16):
        if S % tq:
            continue
        est = (3 * tq * nqh * hd * 2  # q, q3, out (bf16)
               + tq * nqh * hd * 4  # acc (f32)
               + 2 * kvh * tq * group * T * 4  # s + exp (f32)
               + kvh * tq * group * T * 2  # p_ (bf16)
               + (kvh * tq * group * T * 4 if bsparse else 0)  # allow mask
               + 4 * ppc * kvh * bs * hd * 2)  # k/v double buffers
        if est <= 10 * 2**20:
            return tq
    return None


def _ctx_prefill_kernel(tables_ref, ctx_ref, win_ref, q_ref, k_hbm, v_hbm,
                        *rest, kvh: int, group: int, bs: int, hd: int,
                        ppc: int, TQ: int, kv_scale: float,
                        logit_cap: Optional[float], has_alibi: bool):
    if has_alibi:
        slopes_ref, o_ref, k_buf, v_buf, sems = rest
    else:
        o_ref, k_buf, v_buf, sems = rest
    t = pl.program_id(0)
    ctx = ctx_ref[0]
    window = win_ref[0]
    q0 = t * TQ  # first query row of this tile; its position is ctx + q0
    R = TQ * group
    T = ppc * bs

    last_pos = ctx + q0 + TQ - 1
    n_pages_needed = (last_pos + 1 + bs - 1) // bs
    needed_chunks = (n_pages_needed + ppc - 1) // ppc
    # earliest key any row of this tile may attend (first row's window)
    first_valid = jnp.maximum(ctx + q0 - (window - 1), 0)
    first_chunk = first_valid // T

    def start_chunk(c, slot):
        for p in range(ppc):
            page = tables_ref[c * ppc + p]
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
    # [TQ, nqh, hd] -> [kvh, TQ*group, hd]: group rows by kv head so ONE
    # batched dot per chunk feeds the MXU (transpose paid once per
    # program). Dots run in bf16 with f32 accumulation — halves the VMEM
    # footprint vs f32 operands, which is what lets TQ=64+ tiles fit.
    q4 = q_ref[...].reshape(TQ, kvh, group, hd)
    q3 = jnp.transpose(q4, (1, 0, 2, 3)).reshape(kvh, R, hd)
    # row r -> query row i = r // group, key-position bound ctx + q0 + i
    pos_r = (ctx + q0 +
             jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // group)

    m0 = jnp.full((kvh, R, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh, R, 1), jnp.float32)
    acc0 = jnp.zeros((kvh, R, hd), jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c - first_chunk, 2)

        @pl.when(c + 1 < needed_chunks)
        def _():
            start_chunk(c + 1, jax.lax.rem(c + 1 - first_chunk, 2))

        wait_chunk(slot)
        kc = k_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        vc = v_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        k_all = jnp.swapaxes(kc, 0, 1).reshape(kvh, T, hd)
        v_all = jnp.swapaxes(vc, 0, 1).reshape(kvh, T, hd)
        if k_all.dtype != jnp.bfloat16:  # fp8 KV: dequant dtype only;
            k_all = k_all.astype(jnp.bfloat16)  # scales fold algebraically
            v_all = v_all.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q3, k_all, (((2, ), (2, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [kvh, R, T]
        if kv_scale != 1.0:
            s = s * kv_scale
        if logit_cap is not None and logit_cap > 0:
            s = jnp.tanh(s / logit_cap) * logit_cap
        j = c * T + jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        if has_alibi:
            # slopes arrive pre-expanded [kvh, R] (Mosaic cannot collapse
            # a tiled [kvh, TQ, group] across the lane dim in-kernel)
            s = s + slopes_ref[...][:, :, None] * \
                (j - pos_r).astype(jnp.float32)[None]
        valid = (j <= pos_r) & (j > pos_r - window)  # causal + window
        s = jnp.where(valid[None], s, -jnp.inf)
        chunk_m = jnp.max(s, axis=-1, keepdims=True)
        new_m = jnp.maximum(m, chunk_m)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p_ = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        new_l = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_.astype(jnp.bfloat16), v_all,
            (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [kvh, R, hd]
        if kv_scale != 1.0:
            pv = pv * kv_scale
        new_acc = acc * alpha + pv
        return (new_m, new_l, new_acc)

    m, l, acc = jax.lax.fori_loop(first_chunk, needed_chunks, body,
                                  (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)  # [kvh, R, hd]
    out = jnp.transpose(out.reshape(kvh, TQ, group, hd),
                        (1, 0, 2, 3)).reshape(TQ, kvh * group, hd)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale",
                                             "logit_cap", "alibi_slopes"))
def _context_prefill_pallas(q, k_cache, v_cache, block_table, context_len,
                            window=None, *, scale: float,
                            kv_scale: float = 1.0,
                            logit_cap: Optional[float] = None,
                            alibi_slopes=None):
    S, nqh, hd = q.shape
    nb, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    W = block_table.shape[0]
    ppc = PREFILL_PAGES_PER_CHUNK
    if W % ppc != 0:
        pad = ppc - W % ppc
        block_table = jnp.pad(block_table, (0, pad))
        W += pad
    TQ = _pick_q_tile(S, nqh, kvh, hd, ppc, bs)

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _ctx_prefill_kernel, kvh=kvh, group=group, bs=bs, hd=hd, ppc=ppc,
        TQ=TQ, kv_scale=kv_scale, logit_cap=logit_cap,
        has_alibi=alibi_slopes is not None)

    if window is None:
        window = jnp.full((1, ), 2**30, jnp.int32)
    else:
        window = jnp.asarray(window, jnp.int32).reshape(1)
    context_len = jnp.asarray(context_len, jnp.int32).reshape(1)
    in_specs = [
        pl.BlockSpec((TQ, nqh, hd), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # caches stay in HBM
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q_scaled, k_cache, v_cache]
    if alibi_slopes is not None:
        import numpy as np
        sl = np.asarray(alibi_slopes, np.float32).reshape(kvh, 1, group)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(
            np.broadcast_to(sl, (kvh, TQ, group)).reshape(kvh, TQ * group)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S // TQ, ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TQ, nqh, hd), lambda t, *_: (t, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((S, nqh, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
        interpret=interpret,
    )(block_table, context_len, window, *inputs)
    return out


# --- blocksparse context prefill (phi3_small vertical-stride sparsity) -------
#
# Same chunk-skipping design as the blocksparse decode kernel, generalized
# to TQ query rows per program (reference runs its dedicated Triton kernel
# for both phases, vllm/attention/backends/blocksparse_attn.py:410). Each
# program owns one query tile; a PRECOMPUTED per-tile list of needed page
# chunks (local window around the tile's sparse-block range + the vertical
# columns any head can see) drives the double-buffered DMA loop, and the
# per-head vertical/local visibility is applied in-register before the
# online softmax. At phi3_small geometry (sparse block 64, local 16,
# vert_stride 8) a deep-context chunk far behind the tile is only read when
# it contains a vertical column — ~1/vert_stride of the distant context.


def _ctx_prefill_kernel_bsparse(tables_ref, ctx_ref, chunk_idx_ref,
                                nneed_ref, q_ref, k_hbm, v_hbm, o_ref,
                                k_buf, v_buf, sems, *, kvh: int, group: int,
                                bs: int, hd: int, ppc: int, TQ: int,
                                kv_scale: float,
                                logit_cap: Optional[float], sbs: int,
                                local: int, vert: int, step: int):
    t = pl.program_id(0)
    ctx = ctx_ref[0]
    n = nneed_ref[t]
    R = TQ * group
    T = ppc * bs

    def start_chunk(c, slot):
        for p in range(ppc):
            page = tables_ref[c * ppc + p]
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

    start_chunk(chunk_idx_ref[t, 0], 0)
    q4 = q_ref[...].reshape(TQ, kvh, group, hd)
    q3 = jnp.transpose(q4, (1, 0, 2, 3)).reshape(kvh, R, hd)
    # row r -> query row i = r // group at position ctx + t*TQ + i
    pos_r = (ctx + t * TQ +
             jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // group)
    qb_r = pos_r // sbs  # [R, 1] sparse-block index of each query row
    # q-head index per (kv, r): h = kv * group + (r % group) (reference
    # head numbering, blocksparse_attention/utils.py:141-199)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (kvh, R, 1), 0) * group + \
        jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (kvh, R, 1), 1),
                    group)

    m0 = jnp.full((kvh, R, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh, R, 1), jnp.float32)
    acc0 = jnp.zeros((kvh, R, hd), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        c = chunk_idx_ref[t, i]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _():
            start_chunk(chunk_idx_ref[t, i + 1], jax.lax.rem(i + 1, 2))

        wait_chunk(slot)
        kc = k_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        vc = v_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
        k_all = jnp.swapaxes(kc, 0, 1).reshape(kvh, T, hd)
        v_all = jnp.swapaxes(vc, 0, 1).reshape(kvh, T, hd)
        if k_all.dtype != jnp.bfloat16:  # fp8 KV: dequant dtype only
            k_all = k_all.astype(jnp.bfloat16)
            v_all = v_all.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q3, k_all, (((2, ), (2, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)  # [kvh, R, T]
        if kv_scale != 1.0:
            s = s * kv_scale
        if logit_cap is not None and logit_cap > 0:
            s = jnp.tanh(s / logit_cap) * logit_cap
        j = c * T + jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        kb = j // sbs  # [R, T]
        causal = j <= pos_r  # [R, T]
        allow = ((qb_r - kb) < local)[None] | \
            (jax.lax.rem(kb[None] + h_idx * step + 1, vert) == 0)
        s = jnp.where(causal[None] & allow, s, -jnp.inf)
        chunk_m = jnp.max(s, axis=-1, keepdims=True)
        new_m = jnp.maximum(m, chunk_m)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p_ = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        new_l = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_.astype(jnp.bfloat16), v_all,
            (((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)
        if kv_scale != 1.0:
            pv = pv * kv_scale
        new_acc = acc * alpha + pv
        return (new_m, new_l, new_acc)

    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    out = jnp.transpose(out.reshape(kvh, TQ, group, hd),
                        (1, 0, 2, 3)).reshape(TQ, kvh * group, hd)
    o_ref[...] = out.astype(o_ref.dtype)


def _bsparse_ctx_needed_chunks(context_len, S: int, TQ: int, n_chunks: int,
                               T: int, sbs: int, local: int, vert: int,
                               step: int, nqh: int):
    """Per-query-tile ordered list of page chunks any head/row can see.
    Returns (chunk_idx [n_tiles, C] i32 — needed chunks first, ascending —
    and n_needed [n_tiles] i32). Vertical-column visibility reduces to the
    same static residue set as decode (_bsparse_needed_chunks)."""
    residues = sorted({(-(h * step) - 1) % vert for h in range(nqh)})
    n_tiles = S // TQ
    c = jnp.arange(n_chunks, dtype=jnp.int32)  # [C]
    kb0 = (c * T) // sbs
    kb1 = ((c + 1) * T - 1) // sbs
    kb_per_chunk = T // sbs + 1
    kbs = kb0[:, None] + jnp.arange(kb_per_chunk, dtype=jnp.int32)[None]
    kb_ok = kbs <= kb1[:, None]  # [C, kbpc]
    vert_hit = jnp.zeros_like(kb_ok)
    for r in residues:
        vert_hit = vert_hit | (jax.lax.rem(kbs, vert) == r)
    any_vert = jnp.any(vert_hit & kb_ok, axis=1)  # [C]
    ti = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]  # [Tl, 1]
    last_pos = context_len + ti * TQ + TQ - 1  # last row's position
    qb0 = (context_len + ti * TQ) // sbs  # first row's sparse block
    in_range = (c[None] * T) <= last_pos  # causal: some key <= a row pos
    local_overlap = kb1[None] >= (qb0 - local + 1)
    needed = in_range & (local_overlap | any_vert[None])  # [Tl, C]
    big = jnp.int32(2 ** 30)
    key = jnp.where(needed, c[None], big)
    chunk_idx = jnp.argsort(key, axis=1).astype(jnp.int32)
    n_needed = jnp.sum(needed, axis=1).astype(jnp.int32)
    return chunk_idx, n_needed


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale",
                                             "logit_cap", "blocksparse"))
def _context_prefill_pallas_bsparse(q, k_cache, v_cache, block_table,
                                    context_len, *, scale: float,
                                    blocksparse, kv_scale: float = 1.0,
                                    logit_cap: Optional[float] = None):
    S, nqh, hd = q.shape
    nb, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    sbs, local, vert, homo = blocksparse
    step = 0 if homo else max(1, vert // nqh)
    W = block_table.shape[0]
    ppc = PAGES_PER_CHUNK
    if W % ppc != 0:
        pad = ppc - W % ppc
        block_table = jnp.pad(block_table, (0, pad))
        W += pad
    TQ = _pick_q_tile(S, nqh, kvh, hd, ppc, bs, bsparse=True)
    T = ppc * bs
    context_len = jnp.asarray(context_len, jnp.int32).reshape(1)
    chunk_idx, n_needed = _bsparse_ctx_needed_chunks(
        context_len[0], S, TQ, W // ppc, T, int(sbs), int(local),
        int(vert), step, nqh)

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _ctx_prefill_kernel_bsparse, kvh=kvh, group=group, bs=bs, hd=hd,
        ppc=ppc, TQ=TQ, kv_scale=kv_scale, logit_cap=logit_cap,
        sbs=int(sbs), local=int(local), vert=int(vert), step=step)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S // TQ, ),
        in_specs=[
            pl.BlockSpec((TQ, nqh, hd), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TQ, nqh, hd), lambda t, *_: (t, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((S, nqh, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
        interpret=interpret,
    )(block_table, context_len, chunk_idx, n_needed, q_scaled, k_cache,
      v_cache)
    return out


def prefill_attention(q, k, v, k_cache, v_cache, block_table, context_len,
                      *, scale: float, sliding_window: Optional[int] = None,
                      logit_cap: Optional[float] = None,
                      alibi_slopes=None, blocksparse=None,
                      kv_scale: float = 1.0):
    """Context-attended prefill over the paged cache. The current chunk's
    KV (k, v args) is ALREADY in the cache (write-then-attend), so the
    paged kernel serves both cached context and the causal current chunk.
    XLA reference fallback for odd head sizes / tiny blocks / blocksparse /
    ragged chunk lengths."""
    nb, kvh, bs, hd = k_cache.shape
    S, nqh, _ = q.shape
    ppc_used = PAGES_PER_CHUNK if blocksparse is not None \
        else PREFILL_PAGES_PER_CHUNK
    TQ = _pick_q_tile(S, nqh, kvh, hd, ppc_used, bs,
                      bsparse=blocksparse is not None) \
        if (hd % 128 == 0 and nqh % kvh == 0 and bs % 8 == 0) else None
    if blocksparse is not None and TQ is not None and \
            sliding_window is None and alibi_slopes is None:
        return _context_prefill_pallas_bsparse(
            q, k_cache, v_cache, block_table, context_len, scale=scale,
            blocksparse=tuple(blocksparse), kv_scale=kv_scale,
            logit_cap=logit_cap)
    if blocksparse is not None or TQ is None:
        if kv_scale != 1.0:
            # reference path has no in-kernel fp8 dequant (see
            # decode_attention): scale the float-upcast cache instead
            k_cache = k_cache.astype(jnp.float32) * kv_scale
            v_cache = v_cache.astype(jnp.float32) * kv_scale
        return prefill_attention_ref(q, k, v, k_cache, v_cache,
                                     block_table, context_len, scale=scale,
                                     sliding_window=sliding_window,
                                     logit_cap=logit_cap,
                                     alibi_slopes=alibi_slopes,
                                     blocksparse=blocksparse)
    return _context_prefill_pallas(q, k_cache, v_cache, block_table,
                                   context_len, window=sliding_window,
                                   scale=scale, kv_scale=kv_scale,
                                   logit_cap=logit_cap,
                                   alibi_slopes=alibi_slopes)


# --- multi-sequence-per-program decode variant -------------------------------
#
# Small-batch/long-context regime (reference role: paged_attention_v2's
# partitioned kernel, csrc/attention/attention_kernels.cu:89 — the regime
# where few seqs x heads underfill the machine). On a single-TensorCore TPU
# the grid is sequential, so the lever is program-count amortization and
# DMA-pipeline depth, not parallelism: each program owns R sequences and
# streams their pages back to back through the shared double buffer, so the
# per-program prologue/epilogue and the pipeline fill cost are paid once
# per R sequences instead of once per sequence.

SEQS_PER_PROGRAM = 8


def _decode_multiseq_kernel(tables_ref, ctx_ref, win_ref, q_ref, k_hbm,
                            v_hbm, *rest, kvh: int, group: int, bs: int,
                            hd: int, ppc: int, R: int, kv_scale: float,
                            logit_cap: Optional[float]):
    (o_ref, k_buf, v_buf, sems) = rest
    g = pl.program_id(0)
    window = win_ref[0]
    T = ppc * bs

    def start_chunk(r, c, slot):
        for p in range(ppc):
            page = tables_ref[g * R + r, c * ppc + p]
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

    for r in range(R):  # static unroll: R sequences share the buffers
        ctx = ctx_ref[g * R + r]
        n_pages_needed = (ctx + bs - 1) // bs
        needed_chunks = (n_pages_needed + ppc - 1) // ppc
        first_valid = jnp.maximum(ctx - window, 0)
        first_chunk = first_valid // T

        start_chunk(r, first_chunk, 0)
        q = q_ref[r].astype(jnp.float32)  # [nqh, hd]
        m0 = jnp.full((kvh, group, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((kvh, group, 1), jnp.float32)
        acc0 = jnp.zeros((kvh, group, hd), jnp.float32)

        def body(c, carry, r=r, ctx=ctx, first_valid=first_valid,
                 first_chunk=first_chunk, needed_chunks=needed_chunks,
                 q=q):
            m, l, acc = carry
            slot = jax.lax.rem(c - first_chunk, 2)

            @pl.when(c + 1 < needed_chunks)
            def _():
                start_chunk(r, c + 1, jax.lax.rem(c + 1 - first_chunk, 2))

            wait_chunk(slot)
            kc = k_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
            vc = v_buf[pl.ds(slot, 1)].reshape(ppc, kvh, bs, hd)
            pos = c * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
            valid = (pos < ctx) & (pos >= first_valid)
            k_all = jnp.swapaxes(kc, 0, 1).reshape(kvh, T, hd).astype(
                jnp.float32)
            v_all = jnp.swapaxes(vc, 0, 1).reshape(kvh, T, hd).astype(
                jnp.float32)
            if kv_scale != 1.0:
                k_all = k_all * kv_scale
                v_all = v_all * kv_scale
            s = jax.lax.dot_general(
                q.reshape(kvh, group, hd), k_all,
                (((2, ), (2, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32)
            if logit_cap is not None and logit_cap > 0:
                s = jnp.tanh(s / logit_cap) * logit_cap
            s = jnp.where(valid[None], s, -jnp.inf)
            chunk_m = jnp.max(s, axis=-1, keepdims=True)
            new_m = jnp.maximum(m, chunk_m)
            safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
            p_ = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
            alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
            new_l = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p_, v_all, (((2, ), (1, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32)
            return (new_m, new_l, acc * alpha + pv)

        m, l, acc = jax.lax.fori_loop(first_chunk, needed_chunks, body,
                                      (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[r] = out.reshape(kvh * group, hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale",
                                             "logit_cap"))
def _decode_attention_multiseq(q, k_cache, v_cache, block_tables,
                               context_lens, window=None, *, scale: float,
                               kv_scale: float = 1.0,
                               logit_cap: Optional[float] = None):
    B, nqh, hd = q.shape
    nb, kvh, bs, _ = k_cache.shape
    group = nqh // kvh
    W = block_tables.shape[1]
    ppc = PAGES_PER_CHUNK
    R = min(SEQS_PER_PROGRAM, B)
    if W % ppc != 0:
        pad = ppc - W % ppc
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        W += pad
    b_pad = ((B + R - 1) // R) * R
    if b_pad != B:
        q = jnp.pad(q, ((0, b_pad - B), (0, 0), (0, 0)))
        block_tables = jnp.pad(block_tables, ((0, b_pad - B), (0, 0)))
        context_lens = jnp.pad(context_lens, (0, b_pad - B),
                               constant_values=1)

    q_scaled = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kernel = functools.partial(
        _decode_multiseq_kernel, kvh=kvh, group=group, bs=bs, hd=hd,
        ppc=ppc, R=R, kv_scale=kv_scale, logit_cap=logit_cap)
    if window is None:
        window = jnp.full((1, ), 2**30, jnp.int32)
    else:
        window = jnp.asarray(window, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b_pad // R, ),
        in_specs=[
            pl.BlockSpec((R, nqh, hd), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, nqh, hd), lambda g, *_: (g, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((b_pad, nqh, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", )),
        interpret=interpret,
    )(block_tables, context_lens, window, q_scaled, k_cache, v_cache)
    return out[:B]
