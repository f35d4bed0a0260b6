"""MXU rate microbench: bf16 vs int8 dot throughput on the real chip.

Decides whether an int8-activation compute path (W4A8-style, reference
role: marlin QQQ / cutlass int8 epilogues, csrc/quantization/cutlass_w8a8)
is a real lever on this device: nominal TPU v5e does int8 matmul at 2x
the bf16 rate (394 vs 197 TOP/s).

Timing is serialized with a data dependency (lax.scan carry feeds the
next dot) because unchained repeated dispatches get deduplicated by the
axon tunnel (PERF.md "Device-measurement caveats").
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _rate(dtype, acc, m, k, n, iters=32):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (m, k), dtype)
        b = jax.random.normal(key, (k, n), dtype)

    @jax.jit
    def run(a, b):
        def body(carry, _):
            d = jax.lax.dot_general(
                carry, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            # feed the result back into the next dot (same shape/dtype
            # as `a`): cheap elementwise convert, keeps the chain honest
            nxt = d[:, :k].astype(carry.dtype)
            return nxt, d[0, 0]
        _, outs = jax.lax.scan(body, a, None, length=iters)
        return outs

    out = run(a, b)
    jax.block_until_ready(out)
    # the timed call must carry DIFFERENT data: the tunnel dedups a
    # repeat of an identical dispatch (PERF.md caveats)
    a2 = (a + 1).astype(a.dtype) if a.dtype != jnp.int8 else a ^ 1
    t0 = time.perf_counter()
    out = run(a2, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    flops = 2 * m * k * n * iters
    return flops / dt / 1e12


def main():
    results = {}
    for m in (256, 512):
        k, n = 4096, 4096
        bf16 = _rate(jnp.bfloat16, jnp.float32, m, k, n)
        i8 = _rate(jnp.int8, jnp.int32, m, k, n)
        results[f"m{m}"] = {"bf16_tflops": round(bf16, 1),
                            "int8_tops": round(i8, 1),
                            "ratio": round(i8 / bf16, 2)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
