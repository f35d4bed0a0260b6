"""Prefill kernel tile sweep on silicon (VERDICT r3 ask #6 — the oldest
open lever; prefill is the serving bottleneck per the round-3 step trace).

Sweeps, at the REAL serving bucket shapes of the 8B bench model
(32 q heads / 8 kv heads / head_dim 128, token bucket 2048):
  - segment-prefill BLOCK_Q x BLOCK_K (the batched fresh-prefill kernel,
    ops/pallas_prefill.py),
  - context-prefill PAGES_PER_CHUNK (the paged chunked/continuation
    kernel, ops/pallas_attention.py), at depth 0 and 2k cached context.

Timing is scan-chained (output feeds the next iteration's query) because
unchained identical dispatches are answered from a cache by the tunneled
device (PERF.md round-1 measurement caveats).

Usage: python benchmarks/kernels/prefill_tile_sweep.py
Prints one JSON line per configuration.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

ITERS = int(os.environ.get("SWEEP_ITERS", "8"))
T = int(os.environ.get("SWEEP_TOKENS", "2048"))
NQH, KVH, HD = 32, 8, 128
BS = 16  # KV page size


def _chain_time(step_fn, x0, label_extra=""):
    import jax

    def body(c, _):
        return step_fn(c), None

    run = jax.jit(lambda x: jax.lax.scan(body, x, None, length=ITERS)[0])
    out = run(x0)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0) / ITERS * 1e3


def sweep_segment():
    import jax
    import jax.numpy as jnp
    from neural_magic_vllm_tpu.ops import pallas_prefill as pp

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((T, NQH, HD)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((T, KVH, HD)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, KVH, HD)) * 0.1, jnp.bfloat16)
    # 32 prompts of 64 tokens packed into one segment dispatch (the
    # default serving batched-prefill mix at bucket 2048)
    n_seq = 32
    per = T // n_seq
    seq_ids = jnp.asarray(np.repeat(np.arange(n_seq, dtype=np.int32), per))
    q_pos = jnp.asarray(np.tile(np.arange(per, dtype=np.int32), n_seq))
    flops = 0.5 * 2 * n_seq * per * per * NQH * HD  # causal half

    for bq in (128, 256, 512):
        for bk in (128, 256, 512):
            if T % bq or T % bk:
                continue
            pp.BLOCK_Q, pp.BLOCK_K = bq, bk
            jax.clear_caches()
            step = functools.partial(
                lambda qq: pp.segment_prefill_attention(
                    qq, k, v, seq_ids, q_pos, scale=HD**-0.5))
            try:
                ms = _chain_time(step, q0)
            except Exception as e:  # VMEM overflow at large tiles
                print(json.dumps({"kernel": "segment_prefill",
                                  "block_q": bq, "block_k": bk,
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({
                "kernel": "segment_prefill", "tokens": T,
                "block_q": bq, "block_k": bk,
                "ms": round(ms, 3),
                "tflops": round(flops / ms / 1e9, 2),
            }), flush=True)
    pp.BLOCK_Q, pp.BLOCK_K = 256, 256


def sweep_ctx_prefill():
    import jax
    import jax.numpy as jnp
    from neural_magic_vllm_tpu.ops import pallas_attention as pa

    rng = np.random.default_rng(1)
    for ctx_len in (0, 2048):
        total = ctx_len + T
        W = total // BS + 1
        nb = W + 1
        q0 = jnp.asarray(rng.standard_normal((T, NQH, HD)) * 0.1,
                         jnp.bfloat16)
        kc = jnp.asarray(rng.standard_normal((nb, KVH, BS, HD)) * 0.1,
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((nb, KVH, BS, HD)) * 0.1,
                         jnp.bfloat16)
        table = jnp.asarray(rng.permutation(nb - 1)[:W] + 1, jnp.int32)
        kv_dummy = jnp.zeros((T, KVH, HD), jnp.bfloat16)
        flops = 2 * NQH * HD * (T * ctx_len + 0.5 * T * T)
        for ppc in (4, 8, 16):
            pa.PAGES_PER_CHUNK = ppc
            jax.clear_caches()

            def step(qq):
                return pa.prefill_attention(
                    qq, kv_dummy, kv_dummy, kc, vc, table,
                    jnp.int32(ctx_len), scale=HD**-0.5)

            try:
                ms = _chain_time(step, q0)
            except Exception as e:
                print(json.dumps({"kernel": "context_prefill",
                                  "ctx": ctx_len, "pages_per_chunk": ppc,
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({
                "kernel": "context_prefill", "tokens": T, "ctx": ctx_len,
                "pages_per_chunk": ppc,
                "ms": round(ms, 3),
                "tflops": round(flops / ms / 1e9, 2),
            }), flush=True)
    pa.PAGES_PER_CHUNK = 8


def main():
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"skip": "needs TPU"}))
        return
    sweep_segment()
    sweep_ctx_prefill()


if __name__ == "__main__":
    main()
