"""Paged KV-cache storage ops.

TPU-native replacements for the reference's cache kernels
(csrc/cache_kernels.cu: reshape_and_cache, copy_blocks, swap_blocks):

- layout: per-layer K and V arrays of shape
  ``[num_blocks, num_kv_heads, block_size, head_dim]``. Page-major (vs the
  reference TPU port's head-major, vllm/worker/tpu_worker.py:157-173)
  because the Pallas decode kernel partitions work by SEQUENCE: one page =
  one contiguous DMA covering all kv heads. The kv-head axis is still the
  one sharded over the "model" mesh axis.
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
    return (num_blocks, num_kv_heads, block_size, head_dim)


def write_kv(
    k_cache: jax.Array,  # [nb, kvh, bs, hd]
    v_cache: jax.Array,
    key: jax.Array,  # [T, kvh, hd]
    value: jax.Array,
    slot_mapping: jax.Array,  # [T] int32, -1 = padded (dropped)
) -> KVCache:
    """Scatter new K/V into their slots. Donor-buffer friendly: caller
    donates k_cache/v_cache so XLA updates in place."""
    nb, kvh, bs, hd = k_cache.shape
    # Negative indices WRAP in jax scatters; remap padding to an
    # out-of-range index that mode="drop" actually drops.
    slots = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)
    blocks = slots // bs
    offs = slots % bs
    k_cache = k_cache.at[blocks, :, offs, :].set(
        key.astype(k_cache.dtype), mode="drop")
    v_cache = v_cache.at[blocks, :, offs, :].set(
        value.astype(v_cache.dtype), mode="drop")
    return k_cache, v_cache


# Copy-on-write block copies and swap transfers operate on the
# layer-stacked caches and live in worker/cache_engine.py
# (_copy_pages/_gather_pages/_scatter_pages) — the analogues of the
# reference's copy_blocks/swap_blocks cache kernels (csrc/cache_kernels.cu).
