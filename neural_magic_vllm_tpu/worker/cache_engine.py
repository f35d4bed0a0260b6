"""KV-cache allocation + swap engine.

Analogue of the reference CacheEngine (vllm/worker/cache_engine.py:15),
re-designed for the scan-based model: ONE pair of layer-stacked arrays
  k_stack, v_stack: [num_layers, num_blocks, num_kv_heads, block_size, hd]
instead of the reference's per-layer tensor list — one allocation, one
donation per step, and swap/copy touch all layers in a single gather/scatter.
A host-side numpy pool backs CPU swap space.
"""
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.ops.kv_cache import KVCache
from neural_magic_vllm_tpu.utils import next_power_of_2

logger = init_logger(__name__)

_KV_DTYPES = {
    "auto": None,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    "int8": jnp.int8,
}


def get_kv_cache_dtype(cache_dtype: str, model_dtype) -> jnp.dtype:
    dt = _KV_DTYPES.get(cache_dtype)
    return jnp.dtype(dt) if dt is not None else jnp.dtype(model_dtype)


def kv_cache_bytes_per_block(block_size: int, num_kv_heads: int,
                             head_dim: int, num_layers: int,
                             kv_dtype) -> int:
    """Bytes of one block across all layers, K+V (reference
    CacheEngine.get_cache_block_size)."""
    itemsize = jnp.dtype(kv_dtype).itemsize
    return 2 * num_layers * block_size * num_kv_heads * head_dim * itemsize


@functools.partial(jax.jit, donate_argnums=(0, ), static_argnums=(3, ))
def _scatter_pages(cache: jax.Array, pages: jax.Array, dst: jax.Array,
                   _tag: int) -> jax.Array:
    # cache [L, nb, kvh, bs, hd]; pages [n, L, kvh, bs, hd]; dst [n]
    # (-1 remapped to the OOB index nb, dropped — negative indices wrap)
    dst = jnp.where(dst < 0, cache.shape[1], dst)
    pages = jnp.transpose(pages, (1, 0, 2, 3, 4))  # [L, n, kvh, bs, hd]
    return cache.at[:, dst].set(pages, mode="drop")


@functools.partial(jax.jit, static_argnums=(2, ))
def _gather_pages(cache: jax.Array, src: jax.Array, _tag: int) -> jax.Array:
    src = jnp.maximum(src, 0)
    pages = cache[:, src]  # [L, n, kvh, bs, hd]
    return jnp.transpose(pages, (1, 0, 2, 3, 4))  # [n, L, kvh, bs, hd]


@functools.partial(jax.jit, donate_argnums=(0, ), static_argnums=(2, ))
def _copy_pages(kv: KVCache, src_dst: jax.Array, _tag: int) -> KVCache:
    """Batched CoW copies on both stacks (reference copy_blocks)."""
    k, v = kv
    nb = k.shape[1]
    src = src_dst[:, 0]
    dst = jnp.where(src < 0, nb, src_dst[:, 1])
    src = jnp.maximum(src, 0)
    k = k.at[:, dst].set(k[:, src], mode="drop")
    v = v.at[:, dst].set(v[:, src], mode="drop")
    return k, v


class CacheEngine:

    def __init__(self, num_layers: int, num_kv_heads: int, head_dim: int,
                 block_size: int, num_device_blocks: int,
                 num_cpu_blocks: int, kv_dtype, sharding=None,
                 extra_state=None) -> None:
        """extra_state: optional pytree of recurrent-state arrays (mamba
        slot state) appended to the cache pytree — donated and updated
        in-place by every step alongside the KV stacks."""
        self.num_layers = num_layers
        self.block_size = block_size
        self.num_device_blocks = num_device_blocks
        self.num_cpu_blocks = num_cpu_blocks
        self.kv_dtype = jnp.dtype(kv_dtype)
        shape = (num_layers, num_device_blocks, num_kv_heads, block_size,
                 head_dim)
        if sharding is not None:
            k = jax.device_put(jnp.zeros(shape, dtype=self.kv_dtype),
                               sharding)
            v = jax.device_put(jnp.zeros(shape, dtype=self.kv_dtype),
                               sharding)
        else:
            k = jnp.zeros(shape, dtype=self.kv_dtype)
            v = jnp.zeros(shape, dtype=self.kv_dtype)
        self.kv_caches = (k, v) if extra_state is None else \
            (k, v, extra_state)
        cpu_shape = (num_cpu_blocks, num_layers, num_kv_heads, block_size,
                     head_dim)
        # numpy handles fp8/bf16 via ml_dtypes (shipped with jax)
        np_dtype = np.dtype(self.kv_dtype)
        self.cpu_cache = (np.zeros(cpu_shape, dtype=np_dtype),
                          np.zeros(cpu_shape, dtype=np_dtype)) \
            if num_cpu_blocks > 0 else None

    # --- swap --------------------------------------------------------------
    def swap_out(self, src_dst: List[Tuple[int, int]]) -> None:
        if not src_dst:
            return
        n = next_power_of_2(len(src_dst))
        src = np.zeros((n, ), np.int32)
        dst_rows = np.zeros((len(src_dst), ), np.int64)
        for i, (s, d) in enumerate(src_dst):
            src[i] = s
            dst_rows[i] = d
        src_j = jnp.asarray(src)
        k, v = self.kv_caches[:2]
        k_pages = np.asarray(_gather_pages(k, src_j, n))
        v_pages = np.asarray(_gather_pages(v, src_j, n))
        self.cpu_cache[0][dst_rows] = k_pages[:len(src_dst)]
        self.cpu_cache[1][dst_rows] = v_pages[:len(src_dst)]

    def swap_in(self, src_dst: List[Tuple[int, int]]) -> None:
        if not src_dst:
            return
        n = next_power_of_2(len(src_dst))
        dst = np.full((n, ), -1, np.int32)
        src_rows = np.zeros((len(src_dst), ), np.int64)
        for i, (s, d) in enumerate(src_dst):
            src_rows[i] = s
            dst[i] = d
        dst_j = jnp.asarray(dst)
        page_shape = (n, ) + self.cpu_cache[0].shape[1:]
        k_pages = np.zeros(page_shape, dtype=self.cpu_cache[0].dtype)
        v_pages = np.zeros_like(k_pages)
        k_pages[:len(src_dst)] = self.cpu_cache[0][src_rows]
        v_pages[:len(src_dst)] = self.cpu_cache[1][src_rows]
        k, v = self.kv_caches[:2]
        k = _scatter_pages(k, jnp.asarray(k_pages), dst_j, n)
        v = _scatter_pages(v, jnp.asarray(v_pages), dst_j, n)
        self.kv_caches = (k, v) + self.kv_caches[2:]

    # --- copy (CoW) ----------------------------------------------------------
    def copy(self, src_dst: List[Tuple[int, int]]) -> None:
        if not src_dst:
            return
        if len(self.kv_caches) > 2:
            raise NotImplementedError(
                "CoW block copies (forking) are unsupported for stateful "
                "(mamba) models — recurrent state cannot be forked.")
        n = next_power_of_2(len(src_dst))
        pairs = np.full((n, 2), -1, dtype=np.int32)
        pairs[:len(src_dst)] = np.asarray(src_dst, dtype=np.int32)
        self.kv_caches = _copy_pages(self.kv_caches, jnp.asarray(pairs), n)
