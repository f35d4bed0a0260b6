"""Mixture-of-experts ops.

TPU-native replacement for the reference fused_moe Triton pipeline
(vllm/model_executor/layers/fused_moe/fused_moe.py:18-528: topk_softmax ->
moe_align_block_size -> two block GEMMs -> weighted reduce). Default path
is the megablox-style grouped GEMM: token replicas sorted by expert
(the moe_align_block_size role) + jax.lax.ragged_dot group matmuls —
static shapes, no E/top_k FLOP overcommit. A dense-dispatch einsum
formulation is kept as a fallback backend.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_softmax(router_logits: jax.Array, top_k: int,
                 renormalize: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """(reference fused_topk, fused_moe.py:335). Returns
    (weights [T, top_k] f32, ids [T, top_k] i32)."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def grouped_topk(router_logits: jax.Array, top_k: int, num_expert_group: int,
                 topk_group: int, renormalize: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """DeepSeek-V2 grouped routing (reference grouped_topk,
    fused_moe.py:372): keep only the topk_group expert groups by max score,
    then top-k within the surviving experts."""
    T, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    group_scores = probs.reshape(T, num_expert_group,
                                 E // num_expert_group).max(axis=-1)
    _, group_idx = jax.lax.top_k(group_scores, topk_group)  # [T, topk_group]
    group_mask = jnp.zeros((T, num_expert_group), jnp.bool_)
    group_mask = group_mask.at[jnp.arange(T)[:, None], group_idx].set(True)
    expert_mask = jnp.repeat(group_mask, E // num_expert_group, axis=1)
    masked = jnp.where(expert_mask, probs, 0.0)
    weights, ids = jax.lax.top_k(masked, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def fused_moe_ragged(
    x: jax.Array,  # [T, H]
    w_gate: jax.Array,  # [E, H, I]
    w_up: jax.Array,  # [E, H, I]
    w_down: jax.Array,  # [E, I, H]
    topk_weights: jax.Array,  # [T, top_k] f32
    topk_ids: jax.Array,  # [T, top_k] i32
) -> jax.Array:
    """Grouped-GEMM MoE (the megablox formulation; the role of the
    reference's moe_align_block_size + block GEMMs, fused_moe.py:166-527):
    token replicas are sorted by expert and each expert multiplies only its
    own contiguous row group via jax.lax.ragged_dot — no E/top_k FLOP
    overcommit, static shapes throughout."""
    T, H = x.shape
    E = w_gate.shape[0]
    K = topk_ids.shape[1]
    M = T * K
    flat_ids = topk_ids.reshape(-1)
    order = jnp.argsort(flat_ids, stable=True)  # replicas grouped by expert
    src_token = order // K
    gathered = x[src_token]  # [M, H]
    group_sizes = jnp.zeros((E, ), jnp.int32).at[flat_ids].add(1)

    gate = jax.lax.ragged_dot(gathered, w_gate, group_sizes,
                              preferred_element_type=jnp.float32)
    up = jax.lax.ragged_dot(gathered, w_up, group_sizes,
                            preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    down = jax.lax.ragged_dot(act, w_down, group_sizes,
                              preferred_element_type=jnp.float32)  # [M, H]

    w_flat = topk_weights.reshape(-1)[order]
    out = jnp.zeros((T, H), jnp.float32).at[src_token].add(
        down * w_flat[:, None])
    return out.astype(x.dtype)


def fused_moe_dense(
    x: jax.Array,  # [T, H]
    w_gate: jax.Array,  # [E, H, I]  (w13 split; column-sharded on I)
    w_up: jax.Array,  # [E, H, I]
    w_down: jax.Array,  # [E, I, H]  (row-sharded on I)
    topk_weights: jax.Array,  # [T, top_k] f32
    topk_ids: jax.Array,  # [T, top_k] i32
) -> jax.Array:
    """Dense-dispatch MoE: out[t] = sum_k w[t,k] * expert_{id[t,k]}(x[t])."""
    T, H = x.shape
    E = w_gate.shape[0]
    # Combine per-token expert weights into a [T, E] matrix (0 for unused).
    combine = jnp.zeros((T, E), jnp.float32)
    combine = combine.at[jnp.arange(T)[:, None], topk_ids].add(topk_weights)

    xf = x.astype(w_gate.dtype)
    gate = jnp.einsum("th,ehi->eti", xf, w_gate,
                      preferred_element_type=jnp.float32)
    up = jnp.einsum("th,ehi->eti", xf, w_up,
                    preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    down = jnp.einsum("eti,eih->eth", act, w_down,
                      preferred_element_type=jnp.float32)  # [E, T, H]
    out = jnp.einsum("eth,te->th", down, combine)
    return out.astype(x.dtype)


def fused_moe(x, w_gate, w_up, w_down, topk_weights, topk_ids):
    """Backend selector: grouped GEMM (ragged_dot) by default — it does
    1/(E/top_k) of the dense-dispatch FLOPs; NMV_TPU_MOE_BACKEND=dense
    forces the einsum formulation (useful on backends where ragged_dot
    lowers poorly)."""
    from neural_magic_vllm_tpu import envs
    backend = envs.NMV_TPU_MOE_BACKEND
    if backend == "dense":
        return fused_moe_dense(x, w_gate, w_up, w_down, topk_weights,
                               topk_ids)
    return fused_moe_ragged(x, w_gate, w_up, w_down, topk_weights, topk_ids)


def dequant_expert_weights(qweight: jax.Array,  # [E, K//pf, N] int32
                           scales: jax.Array,   # [E, G, N] f32
                           bits: int, k_tile: int, k: int, group_size: int,
                           out_dtype) -> jax.Array:
    """Packed expert stacks -> dense [E, K, N] (vmapped ops/quant
    dequant; the mixtral_quant role). The dense tensor exists only inside
    the step executable — HBM holds the packed form, which is what lets
    W4A16 MoE checkpoints fit on-chip."""
    from neural_magic_vllm_tpu.ops.quant import dequant_weight

    def one(qw, s):
        return dequant_weight(qw, s, None, bits, k_tile, k, group_size,
                              out_dtype)

    return jax.vmap(one)(qweight, scales)


def _align_by_expert(topk_ids: jax.Array, num_experts: int, tile_m: int):
    """The moe_align_block_size role (reference fused_moe.py:166-221):
    sort token replicas by expert and compute ALIGNED destination rows so
    each expert's group starts at a tile_m boundary — every row tile then
    belongs to exactly one expert. Returns (src_token [M], dest [M],
    expert_of_tile [M_pad//tile_m], M_pad); padding rows stay zero."""
    T, K = topk_ids.shape
    M = T * K
    E = num_experts
    flat_ids = topk_ids.reshape(-1)
    order = jnp.argsort(flat_ids, stable=True)
    sorted_ids = flat_ids[order]
    src_token = (order // K).astype(jnp.int32)
    group_sizes = jnp.zeros((E, ), jnp.int32).at[flat_ids].add(1)
    padded = ((group_sizes + tile_m - 1) // tile_m) * tile_m
    pstart = jnp.concatenate([jnp.zeros((1, ), jnp.int32),
                              jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    gstart = jnp.concatenate([jnp.zeros((1, ), jnp.int32),
                              jnp.cumsum(group_sizes)[:-1].astype(jnp.int32)])
    rank = jnp.arange(M, dtype=jnp.int32) - gstart[sorted_ids]
    dest = pstart[sorted_ids] + rank
    # static worst case: each expert wastes < tile_m rows of padding.
    # The tile count is rounded up to a multiple of 8: Mosaic faults on
    # some scalar-prefetch array lengths (empirically, the grouped kernel
    # kernel-faults on chip with 12 m-tiles but runs with 16 — trailing
    # tiles are all-zero rows routed to expert E-1 and never read back).
    n_tiles = ((M + tile_m - 1) // tile_m + E + 7) // 8 * 8
    M_pad = n_tiles * tile_m
    tile_row = jnp.arange(M_pad // tile_m, dtype=jnp.int32) * tile_m
    cum = jnp.cumsum(padded).astype(jnp.int32)
    e_of_tile = jnp.searchsorted(cum, tile_row, side="right").astype(
        jnp.int32)
    e_of_tile = jnp.minimum(e_of_tile, E - 1)  # trailing all-zero tiles
    return src_token, dest, e_of_tile, M_pad, order


def fused_moe_quant_grouped(x, experts: dict, topk_weights, topk_ids, *,
                            bits: int, group_size: int):
    """Grouped Pallas dequant-GEMM MoE: packed experts stream from HBM at
    quantized width per tile (see ops/pallas_quant.quant_grouped_matmul_
    pallas) — no dense expert tensor is ever materialized. This is the
    TPU answer to the reference's Marlin-tiled fused_moe pipeline."""
    from neural_magic_vllm_tpu.ops.pallas_quant import (
        quant_grouped_matmul_pallas)
    from neural_magic_vllm_tpu.ops.quant import select_k_tile
    T, H = x.shape
    E = experts["w_gate_q"].shape[0]
    # bigger tiles amortize weight re-streaming when M is large (prefill)
    tile_m = 128 if T * topk_ids.shape[1] <= 2048 else 256
    src_token, dest, e_of_tile, M_pad, order = _align_by_expert(
        topk_ids, E, tile_m)
    x_al = jnp.zeros((M_pad, H), x.dtype).at[dest].set(x[src_token])

    kt_h = select_k_tile(H, group_size, bits)
    gate = quant_grouped_matmul_pallas(
        x_al, e_of_tile, experts["w_gate_q"], experts["w_gate_s"],
        bits=bits, k_tile=kt_h, group_size=group_size, tile_m=tile_m)
    up = quant_grouped_matmul_pallas(
        x_al, e_of_tile, experts["w_up_q"], experts["w_up_s"],
        bits=bits, k_tile=kt_h, group_size=group_size, tile_m=tile_m)
    act = (jax.nn.silu(gate.astype(jnp.float32)) *
           up.astype(jnp.float32)).astype(x.dtype)
    I = act.shape[1]
    kt_i = select_k_tile(I, group_size, bits)
    down = quant_grouped_matmul_pallas(
        act, e_of_tile, experts["w_down_q"], experts["w_down_s"],
        bits=bits, k_tile=kt_i, group_size=group_size, tile_m=tile_m)

    w_flat = topk_weights.reshape(-1)[order]
    out = jnp.zeros((T, H), jnp.float32).at[src_token].add(
        down[dest].astype(jnp.float32) * w_flat[:, None])
    return out.astype(x.dtype)


def fused_moe_quant_dequant(x, experts: dict, topk_weights, topk_ids, *,
                            bits: int, group_size: int):
    """Fallback: dequantize the full expert stacks in-graph, then run the
    selected dense/ragged backend. Materializes dense bf16 experts every
    step — correct everywhere, but HBM-traffic-bound; kept for backends
    where the grouped Pallas kernel's preconditions don't hold."""
    from neural_magic_vllm_tpu.ops.quant import select_k_tile
    H = x.shape[1]
    kt_h = select_k_tile(H, group_size, bits)
    wg = dequant_expert_weights(experts["w_gate_q"], experts["w_gate_s"],
                                bits, kt_h, H, group_size, x.dtype)
    wu = dequant_expert_weights(experts["w_up_q"], experts["w_up_s"],
                                bits, kt_h, H, group_size, x.dtype)
    I = wg.shape[2]
    kt_i = select_k_tile(I, group_size, bits)
    wd = dequant_expert_weights(experts["w_down_q"], experts["w_down_s"],
                                bits, kt_i, I, group_size, x.dtype)
    return fused_moe(x, wg, wu, wd, topk_weights, topk_ids)


def grouped_fast_path_ok(hidden: int, intermediate: int, *, bits: int,
                         group_size: int) -> bool:
    """True when the grouped Pallas dequant-GEMM kernel's preconditions hold
    for this expert geometry (both GEMM directions H->I and I->H): each
    contraction dim admits a K tile that divides it, the output dim is a
    multiple of the 128-lane MXU width, and the quant group layout is
    tile-local (scales per tile are one contiguous slice). Exposed so tests
    can assert real checkpoint geometries (Mixtral-8x7B/-8x22B, qwen2_moe,
    deepseek_v2) take the grouped path rather than the dequantizing
    fallback — reference analogue: the per-(E,N,dtype) tuned configs of
    /root/reference/vllm/model_executor/layers/fused_moe/fused_moe.py:402-527."""
    from neural_magic_vllm_tpu.ops.quant import select_k_tile
    pf = 32 // bits

    def _fast(k, n):
        gs = k if group_size in (-1, None) else group_size
        try:
            kt = select_k_tile(k, group_size, bits)
        except ValueError:
            return False
        stripe = kt // pf
        return (n % 128 == 0 and
                (gs >= kt or (kt % gs == 0 and gs % stripe == 0)))

    return _fast(hidden, intermediate) and _fast(intermediate, hidden)


def fused_moe_quant(x, experts: dict, topk_weights, topk_ids, *, bits: int,
                    group_size: int):
    """fused_moe over WNA16-packed expert weights. Grouped Pallas kernel by
    default; NMV_TPU_MOE_BACKEND=dense/ragged forces the dequantizing
    fallback."""
    from neural_magic_vllm_tpu import envs
    H = x.shape[1]
    pf = 32 // bits
    I = experts["w_down_q"].shape[1] * pf

    if envs.NMV_TPU_MOE_BACKEND in ("dense", "ragged") or not \
            grouped_fast_path_ok(H, I, bits=bits, group_size=group_size):
        return fused_moe_quant_dequant(x, experts, topk_weights, topk_ids,
                                       bits=bits, group_size=group_size)
    return fused_moe_quant_grouped(x, experts, topk_weights, topk_ids,
                                   bits=bits, group_size=group_size)
