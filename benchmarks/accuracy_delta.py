"""At-scale quantization accuracy delta on the real chip (VERDICT #4b;
reference role: tests/accuracy/test_lm_eval_correctness.py rtol=0.02 gate).

No network egress -> no GSM8K; the feasible at-scale check is the
EXECUTION-PATH delta: perplexity of the 8B W4A16 engine (Pallas fused
dequant-GEMM, integer dots, algebraic zero-point folds) vs a dense bf16
twin built by dequantizing the SAME weights, over the same fixed token
stream. The dequantized twin is the mathematical definition of what the
quantized path must compute, so Δppl bounds the quant-kernel error at
full model scale on real hardware.

Prints one JSON line: {"ppl_quant", "ppl_dense", "rel_delta"}.
"""
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

CTX = int(os.environ.get("ACC_CTX", "512"))
NSEQ = int(os.environ.get("ACC_NSEQ", "4"))


def _ppl(model, params, vocab, L, kvh, hd, label):
    import jax
    import jax.numpy as jnp
    from neural_magic_vllm_tpu.layers.attention import AttentionMetadata

    bs = 16
    nb = CTX // bs + 1

    def forward_ce(params, kv, tokens):
        positions = jnp.arange(CTX, dtype=jnp.int32)
        meta = AttentionMetadata(
            slot_mapping=positions,
            block_tables=jnp.arange(nb, dtype=jnp.int32)[None, :],
            context_lens=jnp.zeros((1, ), jnp.int32))
        hidden, _ = model.forward(params, tokens, positions, kv, meta,
                                  is_prefill=True)
        logits = model.compute_logits(params, hidden)  # [CTX, V] f32
        lp = jax.nn.log_softmax(logits[:-1], axis=-1)
        nll = -jnp.take_along_axis(lp, tokens[1:, None], axis=1)
        return jnp.mean(nll)

    jfn = __import__("jax").jit(forward_ce, donate_argnums=(1, ))
    rng = np.random.default_rng(1234)
    total = 0.0
    for s in range(NSEQ):
        kv = (jnp.zeros((L, nb, kvh, bs, hd), jnp.bfloat16),
              jnp.zeros((L, nb, kvh, bs, hd), jnp.bfloat16))
        toks = jnp.asarray(rng.integers(1, vocab, CTX), jnp.int32)
        total += float(jfn(params, kv, toks))
    ce = total / NSEQ
    print(f"  {label}: mean CE {ce:.6f}", file=sys.stderr)
    return float(np.exp(ce))


def _dequant_host(layers_host, L, bits, group_size):
    """Per-linear host-side dequant to bf16 [L, K, N] stacks. Handles
    both the fused (qkv/gate_up, load-time merge) and unfused layouts —
    the dense twin keeps whichever fusion the quantized engine used, so
    the two paths run identical GEMM shapes."""
    import ml_dtypes
    from neural_magic_vllm_tpu.ops.quant import (select_k_tile,
                                                 unpack_int_tiled)
    names = ("qkv", "gate_up", "o", "down") if "qkv" in layers_host \
        else ("q", "k", "v", "o", "gate", "up", "down")
    if bits is None:
        # fp8 W8A8: dense twin = w_fp8 * weight_scale in bf16 (the
        # mathematical definition of the fp8 weight path; dynamic
        # activation scales are part of the measured execution path)
        out = {}
        for name in names:
            lp = layers_host[name]
            w = np.asarray(lp["weight"]).astype(np.float32)
            sc = np.asarray(lp["weight_scale"], np.float32)
            sc = sc.reshape((L, ) + (1, ) * (w.ndim - 1))
            out[name] = {"weight": (w * sc).astype(ml_dtypes.bfloat16)}
            print(f"  dequantized {name}: {out[name]['weight'].shape}",
                  file=sys.stderr)
        return out
    out = {}
    for name in names:
        lp = layers_host[name]
        qw, scales = np.asarray(lp["qweight"]), np.asarray(lp["scales"])
        zeros = np.asarray(lp["zeros"]) if "zeros" in lp else None
        pf = 32 // bits
        K = qw.shape[1] * pf
        kt = select_k_tile(K, group_size, bits)
        gs = K if group_size in (-1, None) else group_size
        dense = np.empty((L, K, qw.shape[2]), ml_dtypes.bfloat16)
        for l in range(L):
            q = unpack_int_tiled(qw[l], bits, kt, K).astype(np.float32)
            z = zeros[l] if zeros is not None else float(2**(bits - 1))
            sc = np.repeat(scales[l], gs, axis=0)[:K]
            zz = np.repeat(z, gs, axis=0)[:K] if zeros is not None else z
            dense[l] = ((q - zz) * sc).astype(ml_dtypes.bfloat16)
        out[name] = {"weight": dense}
        print(f"  dequantized {name}: {dense.shape}", file=sys.stderr)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from neural_magic_vllm_tpu.config import ModelConfig
    from neural_magic_vllm_tpu.models import get_model_class

    engine, _, _ = bench.build_engine()
    runner = engine.model_executor.driver_worker.model_runner
    model_q = runner.model
    mc = runner.model_config
    vocab = mc.get_vocab_size()
    L = model_q.num_layers
    kvh, hd = model_q.num_kv_heads, model_q.head_dim
    quant_name = runner.quant_config.get_name()
    bits = getattr(runner.quant_config, "bits", None)  # None for fp8
    group_size = getattr(runner.quant_config, "group_size", None)

    ppl_q = _ppl(model_q, runner.params, vocab, L, kvh, hd, "quant")

    host = jax.device_get(runner.params)
    # free the quantized engine's device memory before the 15 GiB dense twin
    engine.model_executor.driver_worker.cache_engine = None
    runner.params = None
    del engine, runner
    gc.collect()

    dense_layers = _dequant_host(host["layers"], L, bits, group_size)
    for k in ("input_norm", "post_norm"):
        dense_layers[k] = host["layers"][k]
    params_d = {"embed": host["embed"], "final_norm": host["final_norm"],
                "lm_head": host["lm_head"], "layers": dense_layers}
    del host
    gc.collect()

    mc_dense = ModelConfig(model="dense-twin", dtype="bfloat16",
                           max_model_len=mc.max_model_len,
                           hf_config=mc.hf_config,
                           skip_tokenizer_init=True)
    model_d = get_model_class(["LlamaForCausalLM"])(mc_dense)
    params_d = jax.device_put(params_d)
    ppl_d = _ppl(model_d, params_d, vocab, L, kvh, hd, "dense")

    rel = abs(ppl_q - ppl_d) / ppl_d
    from neural_magic_vllm_tpu import envs
    path = "fp8w8a8" if bits is None else (
        "w4a8" if envs.NMV_TPU_W4A8 else f"w{bits}a16")
    print(json.dumps({
        "metric": f"{path}_vs_dense_ppl_delta_8b",
        "quant_method": quant_name,
        "ppl_quant": round(ppl_q, 4),
        "ppl_dense": round(ppl_d, 4),
        "rel_delta": round(rel, 6),
        "ctx": CTX, "nseq": NSEQ,
    }))
    assert rel < 0.02, f"quant path diverges from dense twin: {rel}"


if __name__ == "__main__":
    main()
