"""ctypes binding for the native prefix-caching block allocator
(csrc/block_allocator.cc) — same contract as CachedBlockAllocator.

The shared library is built on demand with g++ (cached next to the source);
if no toolchain is available the Python allocator is used instead
(is_available() gates the choice in block_manager.py).
"""
import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_LIB = None
_LIB_LOCK = threading.Lock()
_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_CSRC, "block_allocator.cc")
    so = os.path.join(_CSRC, "libnmv_alloc.so")
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(
            src):
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logger.warning("native allocator build failed: %s", e)
            return None
    lib = ctypes.CDLL(so)
    lib.nmv_cached_alloc_new.restype = ctypes.c_void_p
    lib.nmv_cached_alloc_new.argtypes = [ctypes.c_int32]
    lib.nmv_cached_alloc_delete.argtypes = [ctypes.c_void_p]
    lib.nmv_allocate.restype = ctypes.c_int32
    lib.nmv_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int32]
    lib.nmv_free_block.restype = ctypes.c_int32
    lib.nmv_free_block.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nmv_contains.restype = ctypes.c_int32
    lib.nmv_contains.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.nmv_num_free.restype = ctypes.c_int32
    lib.nmv_num_free.argtypes = [ctypes.c_void_p]
    lib.nmv_update_hash.restype = ctypes.c_int32
    lib.nmv_update_hash.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int32]
    lib.nmv_get_hash.restype = ctypes.c_int64
    lib.nmv_get_hash.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nmv_get_ref_count.restype = ctypes.c_int32
    lib.nmv_get_ref_count.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nmv_set_ref_count.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_int32]
    lib.nmv_get_num_hashed_tokens.restype = ctypes.c_int64
    lib.nmv_get_num_hashed_tokens.argtypes = [ctypes.c_void_p,
                                              ctypes.c_int32]
    lib.nmv_set_num_hashed_tokens.argtypes = [ctypes.c_void_p,
                                              ctypes.c_int32,
                                              ctypes.c_int64]
    lib.nmv_set_last_accessed.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                          ctypes.c_double]
    lib.nmv_get_last_accessed.restype = ctypes.c_double
    lib.nmv_get_last_accessed.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nmv_set_computed.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                     ctypes.c_int32]
    lib.nmv_get_computed.restype = ctypes.c_int32
    lib.nmv_get_computed.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            _LIB = _build_and_load() or False
    return _LIB or None


def is_available() -> bool:
    return get_lib() is not None


class NativeBlockProxy:
    """PhysicalTokenBlock-compatible view over a native block: attribute
    reads/writes delegate to the C side so Python and native state never
    diverge."""

    __slots__ = ("_lib", "_h", "block_number", "device", "block_size")

    def __init__(self, lib, handle, block_number: int, device: str,
                 block_size: int) -> None:
        self._lib = lib
        self._h = handle
        self.block_number = block_number
        self.device = device
        self.block_size = block_size

    @property
    def block_hash(self):
        # negative values are placeholder hashes, same convention as the
        # Python CachedBlockAllocator (block_manager.py:86-88)
        return self._lib.nmv_get_hash(self._h, self.block_number)

    @property
    def ref_count(self) -> int:
        return self._lib.nmv_get_ref_count(self._h, self.block_number)

    @ref_count.setter
    def ref_count(self, v: int) -> None:
        # the block manager sets this directly when a multi-seq group
        # shares freshly-allocated blocks (block_manager.py allocate())
        self._lib.nmv_set_ref_count(self._h, self.block_number, int(v))

    @property
    def num_hashed_tokens(self) -> int:
        return self._lib.nmv_get_num_hashed_tokens(self._h,
                                                   self.block_number)

    @num_hashed_tokens.setter
    def num_hashed_tokens(self, v: int) -> None:
        self._lib.nmv_set_num_hashed_tokens(self._h, self.block_number,
                                            int(v))

    @property
    def last_accessed(self) -> float:
        return self._lib.nmv_get_last_accessed(self._h, self.block_number)

    @last_accessed.setter
    def last_accessed(self, ts: float) -> None:
        self._lib.nmv_set_last_accessed(self._h, self.block_number,
                                        float(ts))

    @property
    def computed(self) -> bool:
        return bool(self._lib.nmv_get_computed(self._h, self.block_number))

    @computed.setter
    def computed(self, v: bool) -> None:
        self._lib.nmv_set_computed(self._h, self.block_number, int(v))

    def __repr__(self) -> str:
        return (f"NativeBlock(num={self.block_number}, "
                f"hash={self.block_hash}, ref={self.ref_count})")


class NativeCachedBlockAllocator:
    """Drop-in for CachedBlockAllocator backed by the C++ core."""

    def __init__(self, device: str, block_size: int,
                 num_blocks: int) -> None:
        self._lib = get_lib()
        assert self._lib is not None
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self._h = ctypes.c_void_p(
            self._lib.nmv_cached_alloc_new(num_blocks))
        self._proxies: Dict[int, NativeBlockProxy] = {}

    def __del__(self):
        lib, h = getattr(self, "_lib", None), getattr(self, "_h", None)
        if lib is not None and h:
            lib.nmv_cached_alloc_delete(h)

    def _proxy(self, bn: int) -> NativeBlockProxy:
        p = self._proxies.get(bn)
        if p is None:
            p = NativeBlockProxy(self._lib, self._h, bn, self.device,
                                 self.block_size)
            self._proxies[bn] = p
        return p

    def allocate(self, block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> NativeBlockProxy:
        bn = self._lib.nmv_allocate(
            self._h, 0 if block_hash is None else int(block_hash),
            int(num_hashed_tokens), 0 if block_hash is None else 1)
        if bn < 0:
            raise ValueError("No usable cache memory left")
        return self._proxy(bn)

    def free(self, block) -> None:
        rc = self._lib.nmv_free_block(self._h, block.block_number)
        if rc < 0:
            raise ValueError(f"Double free! {block} is already freed.")

    def get_num_free_blocks(self) -> int:
        return self._lib.nmv_num_free(self._h)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return bool(self._lib.nmv_contains(self._h, int(block_hash)))

    def update_hash(self, block_hash: int, block) -> None:
        ok = self._lib.nmv_update_hash(self._h, int(block_hash),
                                       block.block_number)
        if not ok:
            raise AssertionError(
                f"hash {block_hash} already present in allocator")
