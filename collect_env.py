"""Environment report for bug reports (role of reference
/root/reference/collect_env.py, minus the CUDA/PyTorch probes that do not
apply on TPU). Prints platform, Python, JAX/jaxlib, device inventory,
key libraries, relevant env vars, and the package version.

Usage: python collect_env.py
"""
import importlib
import os
import platform
import sys


def _ver(mod: str) -> str:
    try:
        m = importlib.import_module(mod)
        return getattr(m, "__version__", "unknown")
    except Exception as e:  # noqa: BLE001
        return f"not installed ({type(e).__name__})"


def main() -> None:
    print("== System ==")
    print(f"OS             : {platform.platform()}")
    print(f"Python         : {sys.version.split()[0]} "
          f"({platform.python_implementation()})")
    print(f"CPU            : {platform.machine()}, "
          f"{os.cpu_count()} logical cores")

    print("\n== Libraries ==")
    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                "numpy", "transformers", "torch", "aiohttp", "zmq",
                "prometheus_client", "opentelemetry.sdk"):
        print(f"{mod:22s}: {_ver(mod)}")
    try:
        from neural_magic_vllm_tpu.version import __version__
        print(f"{'neural_magic_vllm_tpu':22s}: {__version__}")
    except Exception:  # noqa: BLE001
        print("neural_magic_vllm_tpu : import failed")

    print("\n== JAX devices ==")
    try:
        import jax
        print(f"default backend: {jax.default_backend()}")
        for d in jax.devices():
            stats = d.memory_stats() if hasattr(d, "memory_stats") else None
            hbm = (f"{stats['bytes_limit'] / 2**30:.1f} GiB"
                   if stats and "bytes_limit" in stats else "n/a")
            print(f"  {d.id}: {d.device_kind} (platform={d.platform}, "
                  f"memory_stats={hbm})")
    except Exception as e:  # noqa: BLE001
        print(f"  jax.devices() failed: {e}")

    print("\n== Environment variables ==")
    prefixes = ("NMV_TPU_", "JAX_", "XLA_", "LIBTPU", "TPU_")
    for k in sorted(os.environ):
        if k.startswith(prefixes):
            print(f"  {k}={os.environ[k]}")


if __name__ == "__main__":
    main()
