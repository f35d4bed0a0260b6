"""Paged KV-cache storage ops.

TPU-native replacements for the reference's cache kernels
(csrc/cache_kernels.cu: reshape_and_cache, copy_blocks, swap_blocks):

- layout: per-layer K and V arrays of shape
  ``[num_kv_heads, num_blocks, block_size, head_dim]`` (the layout the
  reference's own TPU port chose, vllm/worker/tpu_worker.py:157-173, because
  the decode kernel walks pages per kv-head). The kv-head axis is the one
  sharded over the "model" mesh axis.
- writes are XLA scatters with ``mode="drop"`` so padded slots (-1) are
  discarded in-graph (the reference TPU port used index_copy with a padded
  slot convention, tpu_model_runner.py:24).
- copy/swap are device-side gathers/scatters batched over the block pairs.
"""
from typing import List, Tuple

import jax
import jax.numpy as jnp

KVCache = Tuple[jax.Array, jax.Array]  # (k_cache, v_cache)


def kv_cache_shape(num_blocks: int, block_size: int, num_kv_heads: int,
                   head_dim: int) -> Tuple[int, int, int, int]:
    return (num_kv_heads, num_blocks, block_size, head_dim)


def write_kv(
    k_cache: jax.Array,  # [kvh, nb, bs, hd]
    v_cache: jax.Array,
    key: jax.Array,  # [T, kvh, hd]
    value: jax.Array,
    slot_mapping: jax.Array,  # [T] int32, -1 = padded (dropped)
) -> KVCache:
    """Scatter new K/V into their slots. Donor-buffer friendly: caller
    donates k_cache/v_cache so XLA updates in place."""
    kvh, nb, bs, hd = k_cache.shape
    k_flat = k_cache.reshape(kvh, nb * bs, hd)
    v_flat = v_cache.reshape(kvh, nb * bs, hd)
    # Negative indices WRAP in jax scatters; remap padding to an
    # out-of-range index that mode="drop" actually drops.
    slots = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)
    # [T, kvh, hd] -> [kvh, T, hd]
    key_t = jnp.swapaxes(key, 0, 1).astype(k_cache.dtype)
    value_t = jnp.swapaxes(value, 0, 1).astype(v_cache.dtype)
    k_flat = k_flat.at[:, slots, :].set(key_t, mode="drop")
    v_flat = v_flat.at[:, slots, :].set(value_t, mode="drop")
    return k_flat.reshape(k_cache.shape), v_flat.reshape(v_cache.shape)


# Copy-on-write block copies and swap transfers operate on the
# layer-stacked caches and live in worker/cache_engine.py
# (_copy_pages/_gather_pages/_scatter_pages) — the analogues of the
# reference's copy_blocks/swap_blocks cache kernels (csrc/cache_kernels.cu).
