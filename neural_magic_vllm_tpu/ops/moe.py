"""Mixture-of-experts ops.

TPU-native replacement for the reference fused_moe Triton pipeline
(vllm/model_executor/layers/fused_moe/fused_moe.py:18-528: topk_softmax ->
moe_align_block_size -> two block GEMMs -> weighted reduce). On TPU the
inference token counts are small (decode buckets <= a few hundred), so
round-1 uses a dense-dispatch formulation: every expert processes every
token through one batched einsum (MXU-friendly, no sorting/scatter),
and non-selected experts are zero-weighted in the reduce. FLOP overcommit is
E/top_k, but the op stays a single fused XLA computation with static shapes.
A megablox-style grouped GEMM replaces it for large-batch prefill later.
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


def fused_moe(
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
