"""Paged-attention decode kernel microbenchmark (role of reference
benchmarks/kernels/benchmark_paged_attention.py): Pallas ragged kernel vs
the XLA gather reference over batch/context sweeps."""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.ops.attention import decode_attention_ref
from neural_magic_vllm_tpu.ops.pallas_attention import \
    _decode_attention_pallas


def main(args):
    rng = np.random.default_rng(0)
    nb = args.num_blocks
    kvh, hd, bs = args.kv_heads, args.head_dim, args.block_size
    k = jnp.asarray(rng.standard_normal((nb, kvh, bs, hd)) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((nb, kvh, bs, hd)) * 0.3,
                    jnp.bfloat16)
    scale = hd**-0.5
    results = []
    for B in (8, 32, 64):
        W = args.max_ctx // bs
        q = jnp.asarray(rng.standard_normal((B, args.q_heads, hd)),
                        jnp.bfloat16)
        tables = jnp.asarray(
            rng.integers(0, nb, (B, W)).astype(np.int32))
        for ctx in (args.max_ctx // 8, args.max_ctx // 2, args.max_ctx - 8):
            lens = jnp.full((B, ), ctx, jnp.int32)
            import functools
            f_ref = jax.jit(functools.partial(decode_attention_ref,
                                              scale=scale))
            f_pal = jax.jit(functools.partial(_decode_attention_pallas,
                                              scale=scale))
            row = {"batch": B, "ctx": ctx}
            for name, f in (("xla_ref", f_ref), ("pallas", f_pal)):
                r = f(q, k, v, tables, lens)
                r.block_until_ready()
                n = 30
                t0 = time.perf_counter()
                for _ in range(n):
                    r = f(q + r.astype(q.dtype) * jnp.bfloat16(1e-8), k, v,
                          tables, lens)
                r.block_until_ready()
                row[f"{name}_us"] = round((time.perf_counter() - t0) / n *
                                          1e6, 1)
            results.append(row)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-blocks", type=int, default=2048)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--max-ctx", type=int, default=1024)
    main(p.parse_args())
