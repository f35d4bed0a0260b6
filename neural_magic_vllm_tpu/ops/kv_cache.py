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


def copy_blocks(kv_caches: List[KVCache],
                src_dst: jax.Array) -> List[KVCache]:
    """Batched copy-on-write block copies (reference copy_blocks,
    csrc/cache_kernels.cu). src_dst: [N, 2] int32; rows with src < 0 are
    no-ops (padding), implemented by clamping dst to an OOB index that
    mode="drop" discards."""
    if src_dst.shape[0] == 0:
        return kv_caches
    nb = kv_caches[0][0].shape[1]
    src = src_dst[:, 0]
    dst = jnp.where(src < 0, nb, src_dst[:, 1])  # nb = OOB -> dropped
    src = jnp.maximum(src, 0)
    out = []
    for k_cache, v_cache in kv_caches:
        k_cache = k_cache.at[:, dst].set(k_cache[:, src], mode="drop")
        v_cache = v_cache.at[:, dst].set(v_cache[:, src], mode="drop")
        out.append((k_cache, v_cache))
    return out


# jitted with donation so the copies happen in place on device
_copy_blocks_jit = jax.jit(copy_blocks, donate_argnums=(0, ))


def copy_blocks_inplace(kv_caches, src_dst_pairs) -> List[KVCache]:
    src_dst = jnp.asarray(src_dst_pairs, dtype=jnp.int32).reshape(-1, 2)
    return _copy_blocks_jit(kv_caches, src_dst)
