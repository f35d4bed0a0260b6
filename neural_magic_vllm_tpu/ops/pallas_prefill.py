"""Pallas flash segment-prefill attention.

Kernel for the ragged batched prefill (ops/attention.py
segment_prefill_attention_ref): multiple context-free prompts concatenated
on one flat token axis, isolated by segment ids. Flash-style online softmax
over key blocks keeps the [T, T] score matrix out of HBM, and causal
block pruning skips key blocks entirely above the diagonal.

Grid: (num_kv_heads, T / BLOCK_Q). K/V stay resident in VMEM per kv-head
(T <= a few k tokens at prefill bucket sizes), GQA handled by keeping the
query group dim inside each block.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_magic_vllm_tpu.ops.attention import segment_prefill_attention_ref

BLOCK_Q = 256
# 512-deep key blocks measured ~5% faster than 256 at the 2048-token
# serving bucket on chip (benchmarks/kernels/prefill_tile_sweep.py, r4):
# fewer fori_loop iterations, same MXU tiling.
BLOCK_K = 512


def _kernel(q_ref, k_ref, v_ref, sq_ref, pq_ref, sk_ref, pk_ref, o_ref, *,
            bq: int, bk: int, group: int, hd: int, T: int, scale: float,
            logit_cap: Optional[float], window: Optional[int] = None):
    qb = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, g, hd]
    sq = sq_ref[:]  # [BQ, 1]
    pq = pq_ref[:]  # [BQ, 1]

    m0 = jnp.full((bq, group, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, group, 1), jnp.float32)
    acc0 = jnp.zeros((bq, group, hd), jnp.float32)
    q2 = q.reshape(bq * group, hd)

    n_kb = ((qb + 1) * bq + bk - 1) // bk  # causal: prune above-diagonal
    # sliding window: same-segment keys sit at flat offset (pq - pk) behind
    # the query, so key blocks entirely before qb*bq - window + 1 are
    # invisible to every row of this tile (cross-segment pairs are masked
    # anyway) — the below-diagonal analogue of the causal prune
    kb0 = 0 if window is None else jnp.maximum(
        0, (qb * bq - window + 1) // bk)

    def body(kb, carry):
        m, l, acc = carry
        start = kb * bk
        k_blk = k_ref[0, pl.ds(start, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(start, bk), :].astype(jnp.float32)
        sk = sk_ref[0:1, pl.ds(start, bk)]  # [1, BK]
        pk = pk_ref[0:1, pl.ds(start, bk)]

        s = jax.lax.dot_general(q2, k_blk, (((1, ), (1, )), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s.reshape(bq, group, bk)
        if logit_cap is not None and logit_cap > 0:
            s = jnp.tanh(s / logit_cap) * logit_cap
        mask = (sq == sk) & (sq >= 0) & (pk <= pq)  # [BQ, BK]
        if window is not None:
            mask = mask & (pk > pq - window)
        s = jnp.where(mask[:, None, :], s, -jnp.inf)

        blk_m = jnp.max(s, axis=-1, keepdims=True)
        new_m = jnp.maximum(m, blk_m)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        new_l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.reshape(bq * group, bk), v_blk,
                                 (((1, ), (0, )), ((), ())),
                                 preferred_element_type=jnp.float32)
        new_acc = acc * alpha + pv.reshape(bq, group, hd)
        return new_m, new_l, new_acc

    m, l, acc = jax.lax.fori_loop(kb0, n_kb, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "logit_cap",
                                             "window"))
def _segment_prefill_pallas(q, k, v, seq_ids, q_pos, *, scale: float,
                            logit_cap: Optional[float] = None,
                            window: Optional[int] = None):
    T, nqh, hd = q.shape
    kvh = k.shape[1]
    group = nqh // kvh
    bq = min(BLOCK_Q, T)
    bk = min(BLOCK_K, T)

    q4 = q.reshape(T, kvh, group, hd).transpose(1, 0, 2, 3)  # [kvh,T,g,hd]
    k3 = k.transpose(1, 0, 2)  # [kvh, T, hd]
    v3 = v.transpose(1, 0, 2)
    sq_col = seq_ids[:, None].astype(jnp.int32)  # [T, 1]
    pq_col = q_pos[:, None].astype(jnp.int32)
    sk_row = seq_ids[None, :].astype(jnp.int32)  # [1, T]
    pk_row = q_pos[None, :].astype(jnp.int32)

    kernel = functools.partial(_kernel, bq=bq, bk=bk, group=group, hd=hd,
                               T=T, scale=scale, logit_cap=logit_cap,
                               window=window)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid=(kvh, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, group, hd), lambda h, qb: (h, qb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda h, qb: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda h, qb: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda h, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda h, qb: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda h, qb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda h, qb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, group, hd),
                               lambda h, qb: (h, qb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kvh, T // bq * bq, group, hd),
                                       q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * T * nqh * hd, bytes_accessed=3 * T * nqh * hd * 2,
            transcendentals=T * T * nqh),
        interpret=interpret,
    )(q4, k3, v3, sq_col, pq_col, sk_row, pk_row)
    # [kvh, T, g, hd] -> [T, kvh*g, hd]
    return out.transpose(1, 0, 2, 3).reshape(T, nqh, hd)


def segment_prefill_attention(q, k, v, seq_ids, q_pos, *, scale: float,
                              sliding_window: Optional[int] = None,
                              logit_cap: Optional[float] = None):
    """Flash segment prefill (sliding windows handled in-kernel with
    below-diagonal block pruning — r4; the jnp fallback materializes
    O(T^2) scores, which at the 16k token bucket is a 32 GiB allocation).
    XLA reference fallback only for odd head sizes / tiny token counts."""
    import numpy as np
    T, nqh, hd = q.shape
    kvh = k.shape[1]
    # traced per-layer windows (gemma2 alternation) cannot key a static
    # kernel variant; only None / python-int windows take the kernel
    static_window = sliding_window is None or isinstance(
        sliding_window, (int, np.integer))
    use_kernel = (static_window and hd % 128 == 0 and nqh % kvh == 0
                  and T % min(BLOCK_Q, T) == 0 and T >= 128 and
                  jax.default_backend() in ("tpu", "axon"))
    if not use_kernel:
        return segment_prefill_attention_ref(
            q, k, v, seq_ids, q_pos, scale=scale,
            sliding_window=sliding_window, logit_cap=logit_cap)
    return _segment_prefill_pallas(
        q, k, v, seq_ids, q_pos, scale=scale, logit_cap=logit_cap,
        window=int(sliding_window) if sliding_window is not None else None)
