"""Small utilities (analogue of reference vllm/utils.py)."""
import socket
import time
from collections import OrderedDict
from typing import Generic, Hashable, Optional, TypeVar

T = TypeVar("T")


class Counter:
    """Monotonic id counter (reference vllm/utils.py:60)."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


class LRUCache(Generic[T]):
    """Simple LRU cache with a pin/eviction callback seam
    (reference vllm/utils.py:74)."""

    def __init__(self, capacity: int):
        self.cache: OrderedDict[Hashable, T] = OrderedDict()
        self.capacity = capacity

    def __contains__(self, key: Hashable) -> bool:
        return key in self.cache

    def __len__(self) -> int:
        return len(self.cache)

    def get(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        return default

    def put(self, key: Hashable, value: T) -> None:
        self.cache[key] = value
        self.cache.move_to_end(key)
        while len(self.cache) > self.capacity:
            k, v = self.cache.popitem(last=False)
            self._on_remove(k, v)

    def pop(self, key: Hashable, default: Optional[T] = None) -> Optional[T]:
        return self.cache.pop(key, default)

    def clear(self) -> None:
        self.cache.clear()

    def _on_remove(self, key: Hashable, value: T) -> None:
        pass


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


# Per-chip HBM by device_kind, used when the PJRT client exposes no
# memory_stats() (some tunneled/experimental plugins return None).
_HBM_BY_DEVICE_KIND = {
    "TPU v2": 8 << 30,
    "TPU v3": 16 << 30,
    "TPU v4 lite": 8 << 30,
    "TPU v4": 32 << 30,
    "TPU v5 lite": 16 << 30,
    "TPU v5e": 16 << 30,
    "TPU v5": 95 << 30,
    "TPU v5p": 95 << 30,
    "TPU v6 lite": 32 << 30,
    "TPU v6e": 32 << 30,
}


def device_hbm_bytes(dev) -> Optional[int]:
    """Best-effort per-chip HBM capacity: NMV_TPU_HBM_BYTES env override,
    then memory_stats()['bytes_limit'], then a device_kind table."""
    import os
    env = os.environ.get("NMV_TPU_HBM_BYTES")
    if env:
        return int(env)
    stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    kind = getattr(dev, "device_kind", "") or ""
    for key, size in _HBM_BY_DEVICE_KIND.items():
        if kind.startswith(key):
            return size
    return None


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def now() -> float:
    return time.monotonic()


def maybe_enable_trace_function_call() -> Optional[str]:
    """Hang debugging (reference VLLM_TRACE_FUNCTION, vllm/utils.py:729 +
    envs.py:199): when NMV_TPU_TRACE_FUNCTION=1, log every package-local
    Python function call/return with a timestamp to a temp file, so a
    stuck engine's log tail shows exactly where it stopped. Costly —
    debugging only. Returns the log path when enabled."""
    import datetime
    import os
    import sys
    import tempfile
    import threading

    from neural_magic_vllm_tpu import envs
    if not envs.NMV_TPU_TRACE_FUNCTION:
        return None
    root = os.path.dirname(os.path.abspath(__file__))
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    log_path = os.path.join(
        tempfile.gettempdir(), "nmv_tpu",
        f"TRACE_FUNCTION_pid{os.getpid()}_"
        f"tid{threading.get_ident()}_{stamp}.log")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    f = open(log_path, "a", buffering=1)

    def tracer(frame, event, arg):
        if event in ("call", "return"):
            fn = frame.f_code.co_filename
            if fn.startswith(root):
                f.write(f"{datetime.datetime.now().isoformat()} {event} "
                        f"{fn}:{frame.f_lineno} "
                        f"{frame.f_code.co_name}\n")
        return tracer

    sys.settrace(tracer)
    threading.settrace(tracer)
    return log_path


STR_DTYPE_TO_BITS = {
    "auto": 16,
    "bfloat16": 16,
    "float16": 16,
    "float32": 32,
    "fp8": 8,
    "fp8_e4m3": 8,
    "fp8_e5m2": 8,
    "int8": 8,
}


def make_ndarray_with_pad(x, pad, dtype, *, max_len=None):
    """Ragged list-of-lists -> padded 2D numpy array
    (analogue of reference make_tensor_with_pad, vllm/utils.py:629)."""
    import numpy as np
    if max_len is None:
        max_len = max((len(row) for row in x), default=0)
    out = np.full((len(x), max_len), pad, dtype=dtype)
    for i, row in enumerate(x):
        out[i, :len(row)] = row
    return out
