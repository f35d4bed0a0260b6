"""KV-cache allocation + swap engine.

Analogue of the reference CacheEngine (vllm/worker/cache_engine.py:15):
allocates per-layer paged KV arrays on device and a host-side numpy swap
pool, and executes the scheduler's swap_in/swap_out/copy directives.
Copies run in-graph (donated buffers); swaps are host<->device transfers of
gathered pages over a padded pair list so each direction compiles once.
"""
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.ops.kv_cache import KVCache, kv_cache_shape
from neural_magic_vllm_tpu.utils import STR_DTYPE_TO_BITS, next_power_of_2

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
    # cache [kvh, nb, bs, hd]; pages [n, kvh, bs, hd]; dst [n] (-1 dropped
    # via remap to the OOB index nb — negative indices wrap in jax)
    dst = jnp.where(dst < 0, cache.shape[1], dst)
    return cache.at[:, dst].set(jnp.swapaxes(pages, 0, 1), mode="drop")


@functools.partial(jax.jit, static_argnums=(2, ))
def _gather_pages(cache: jax.Array, src: jax.Array, _tag: int) -> jax.Array:
    src = jnp.maximum(src, 0)
    return jnp.swapaxes(cache[:, src], 0, 1)  # [n, kvh, bs, hd]


class CacheEngine:

    def __init__(self, num_layers: int, num_kv_heads: int, head_dim: int,
                 block_size: int, num_device_blocks: int,
                 num_cpu_blocks: int, kv_dtype) -> None:
        self.num_layers = num_layers
        self.block_size = block_size
        self.num_device_blocks = num_device_blocks
        self.num_cpu_blocks = num_cpu_blocks
        self.kv_dtype = jnp.dtype(kv_dtype)
        shape = kv_cache_shape(num_device_blocks, block_size, num_kv_heads,
                               head_dim)
        self.kv_caches: List[KVCache] = [
            (jnp.zeros(shape, dtype=self.kv_dtype),
             jnp.zeros(shape, dtype=self.kv_dtype))
            for _ in range(num_layers)
        ]
        cpu_shape = (num_cpu_blocks, num_kv_heads, block_size, head_dim)
        # numpy handles fp8/bf16 via ml_dtypes (shipped with jax)
        np_dtype = np.dtype(self.kv_dtype)
        self.cpu_cache = [
            (np.zeros(cpu_shape, dtype=np_dtype),
             np.zeros(cpu_shape, dtype=np_dtype))
            for _ in range(num_layers)
        ] if num_cpu_blocks > 0 else []

    # --- swap --------------------------------------------------------------
    def swap_out(self, src_dst: List[Tuple[int, int]]) -> None:
        if not src_dst:
            return
        n = next_power_of_2(len(src_dst))
        src = np.full((n, ), 0, np.int32)
        dst_rows = np.zeros((len(src_dst), ), np.int64)
        for i, (s, d) in enumerate(src_dst):
            src[i] = s
            dst_rows[i] = d
        src_j = jnp.asarray(src)
        for li, (k, v) in enumerate(self.kv_caches):
            k_pages = np.asarray(_gather_pages(k, src_j, n))
            v_pages = np.asarray(_gather_pages(v, src_j, n))
            ck, cv = self.cpu_cache[li]
            ck[dst_rows] = k_pages[:len(src_dst)]
            cv[dst_rows] = v_pages[:len(src_dst)]

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
        for li in range(self.num_layers):
            ck, cv = self.cpu_cache[li]
            k_pages = np.zeros((n, ) + ck.shape[1:], dtype=ck.dtype)
            v_pages = np.zeros_like(k_pages)
            k_pages[:len(src_dst)] = ck[src_rows]
            v_pages[:len(src_dst)] = cv[src_rows]
            k, v = self.kv_caches[li]
            k = _scatter_pages(k, jnp.asarray(k_pages), dst_j, n)
            v = _scatter_pages(v, jnp.asarray(v_pages), dst_j, n)
            self.kv_caches[li] = (k, v)

    # --- copy (CoW) ----------------------------------------------------------
    def copy(self, src_dst: List[Tuple[int, int]]) -> None:
        if not src_dst:
            return
        from neural_magic_vllm_tpu.ops.kv_cache import copy_blocks_inplace
        n = next_power_of_2(len(src_dst))
        pairs = np.full((n, 2), -1, dtype=np.int32)
        pairs[:len(src_dst)] = np.asarray(src_dst, dtype=np.int32)
        self.kv_caches = copy_blocks_inplace(self.kv_caches, pairs)
