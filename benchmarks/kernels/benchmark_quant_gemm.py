"""W4A16/W8A16 fused dequant-GEMM microbenchmark (role of reference
benchmarks/kernels/benchmark_marlin.py): Pallas kernel vs dense bf16 vs the
XLA dequant-then-matmul reference across shapes. Uses a device-side scan so
the measurement is not limited by per-dispatch tunnel latency."""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.ops.pallas_quant import quant_matmul_pallas
from neural_magic_vllm_tpu.ops.quant import pack_int_tiled, select_k_tile


def bench(fn, x, iters=100):
    @jax.jit
    def loop(x):
        def body(carry, _):
            out = fn(carry)
            K = carry.shape[-1]
            nxt = carry + out[:, :K].astype(carry.dtype) * \
                jnp.bfloat16(1e-8)
            return nxt, ()
        final, _ = jax.lax.scan(body, x, None, length=iters)
        return final

    loop(x).block_until_ready()
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main(args):
    rng = np.random.default_rng(0)
    results = []
    shapes = [(args.m, 4096, 4096), (args.m, 4096, 14336),
              (args.m, 14336, 4096)]
    for (M, K, N) in shapes:
        gs = args.group_size
        kt = select_k_tile(K, gs, args.bits)
        G = K // (K if gs == -1 else gs)
        q = rng.integers(0, 2**args.bits, (K, N)).astype(np.uint32)
        packed = jnp.asarray(pack_int_tiled(q, args.bits, kt))
        scales = jnp.asarray((rng.uniform(0.5, 1.5, (G, N)) *
                              0.01).astype(np.float32))
        wd = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

        t_dense = bench(
            lambda a: jnp.dot(a, wd, preferred_element_type=jnp.float32), x)
        t_pallas = bench(
            lambda a: quant_matmul_pallas(a, packed, scales, None,
                                          bits=args.bits, k_tile=kt,
                                          group_size=gs).astype(
                                              jnp.float32), x)
        results.append({
            "shape": f"{M}x{K}x{N}",
            "dense_bf16_us": round(t_dense * 1e6, 1),
            f"pallas_w{args.bits}_us": round(t_pallas * 1e6, 1),
            "speedup": round(t_dense / t_pallas, 2),
        })
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--bits", type=int, default=4, choices=(4, 8))
    p.add_argument("--group-size", type=int, default=128)
    main(p.parse_args())
