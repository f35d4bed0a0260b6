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


def write_kv_flat(
    k_flat: jax.Array,  # [L*nb, kvh, bs, hd] (layer-flattened stacks)
    v_flat: jax.Array,
    key: jax.Array,  # [T, kvh, hd]
    value: jax.Array,
    slot_mapping: jax.Array,  # [T] int32, -1 = padded (dropped)
    layer_id: jax.Array,  # scalar int32 (traced: lax.scan layer index)
    blocks_per_layer: int,
) -> KVCache:
    """Scatter one layer's new K/V into the layer-FLATTENED stacks by
    global flat row index. This exact formulation — a single leading index
    axis with a full trailing [hd] slice — is what XLA's buffer assignment
    updates IN PLACE through the layer scan (donated carry, zero temp):
    the per-layer [nb, kvh, bs, hd] ys-output formulation double-buffered
    the entire cache every step."""
    kvh, bs, hd = k_flat.shape[1], k_flat.shape[2], k_flat.shape[3]
    total_rows = k_flat.shape[0] * kvh * bs
    T = key.shape[0]
    slots = slot_mapping
    blk = slots // bs
    off = slots % bs
    h = jnp.arange(kvh, dtype=jnp.int32)
    idx = ((layer_id * blocks_per_layer + blk[:, None]) * kvh +
           h[None, :]) * bs + off[:, None]  # [T, kvh]
    idx = jnp.where((slots < 0)[:, None], total_rows, idx)  # drop padding
    k2 = k_flat.reshape(total_rows, hd)
    v2 = v_flat.reshape(total_rows, hd)
    k2 = k2.at[idx.reshape(-1)].set(
        key.astype(k_flat.dtype).reshape(T * kvh, hd), mode="drop")
    v2 = v2.at[idx.reshape(-1)].set(
        value.astype(v_flat.dtype).reshape(T * kvh, hd), mode="drop")
    return (k2.reshape(k_flat.shape), v2.reshape(v_flat.shape))


# Copy-on-write block copies and swap transfers operate on the
# layer-stacked caches and live in worker/cache_engine.py
# (_copy_pages/_gather_pages/_scatter_pages) — the analogues of the
# reference's copy_blocks/swap_blocks cache kernels (csrc/cache_kernels.cu).
