"""Quantized-kernel tests vs naive golden math (the model of the reference's
tests/kernels/test_marlin_gemm.py / test_int8_quant.py: every fused op is
checked against dequantize-then-matmul)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.quant import (fp8_scaled_mm, int8_scaled_mm,
                                             pack_int_tiled,
                                             quant_matmul_ref,
                                             scaled_fp8_quant,
                                             scaled_int8_quant,
                                             select_k_tile,
                                             unpack_int_tiled)
from neural_magic_vllm_tpu.ops.pallas_quant import quant_matmul_pallas
from neural_magic_vllm_tpu.quantization.awq import unpack_awq
from neural_magic_vllm_tpu.quantization.gptq import (unpack_gptq_qweight,
                                                     unpack_gptq_qzeros)


@pytest.mark.parametrize("bits,k_tile,K,N", [(4, 512, 1024, 256),
                                             (4, 64, 128, 256),
                                             (8, 256, 512, 128)])
def test_pack_roundtrip(bits, k_tile, K, N):
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2**bits, (K, N)).astype(np.uint32)
    packed = pack_int_tiled(q, bits, k_tile)
    assert packed.shape == (K // (32 // bits), N)
    assert (unpack_int_tiled(packed, bits, k_tile, K) == q).all()


@pytest.mark.parametrize("bits,gs,K,N,M,zeros", [
    (4, 128, 1024, 512, 8, True),
    (4, -1, 512, 256, 32, False),
    (8, 64, 512, 256, 5, True),
    (4, 32, 256, 128, 17, False),
])
def test_quant_matmul_vs_golden(bits, gs, K, N, M, zeros):
    rng = np.random.default_rng(1)
    kt = select_k_tile(K, gs, bits)
    gse = K if gs == -1 else gs
    G = K // gse
    q = rng.integers(0, 2**bits, (K, N)).astype(np.uint32)
    packed = jnp.asarray(pack_int_tiled(q, bits, kt))
    scales = (rng.uniform(0.5, 1.5, (G, N)) * 0.01).astype(np.float32)
    z = rng.integers(0, 2**bits, (G, N)).astype(np.float32) if zeros \
        else np.full((G, N), float(1 << (bits - 1)), np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = ((q.reshape(G, gse, N) - z.reshape(G, 1, N)) *
         scales.reshape(G, 1, N)).reshape(K, N)
    import ml_dtypes
    gold = (x.astype(ml_dtypes.bfloat16).astype(np.float64) @
            w.astype(ml_dtypes.bfloat16).astype(np.float64))
    norm = np.abs(gold).max()
    xj = jnp.asarray(x, jnp.bfloat16)
    zj = jnp.asarray(z) if zeros else None
    ref = quant_matmul_ref(xj, packed, jnp.asarray(scales), zj, bits, kt, gs)
    pal = quant_matmul_pallas(xj, packed, jnp.asarray(scales), zj, bits=bits,
                              k_tile=kt, group_size=gs)
    for out in (ref, pal):
        rel = np.abs(np.asarray(out, np.float64) - gold).max() / norm
        assert rel < 0.02, rel


def test_gptq_unpack():
    """GPTQ word format: pf values LSB-first along K; qzeros stored -1."""
    rng = np.random.default_rng(2)
    K, N, bits = 64, 8, 4
    q = rng.integers(0, 16, (K, N)).astype(np.uint32)
    words = np.zeros((K // 8, N), np.uint32)
    for i in range(8):
        words |= q[i::8] << (4 * i)
    out = unpack_gptq_qweight(words.astype(np.int32), bits)
    assert (out == q).all()

    G = 4
    z = rng.integers(1, 16, (G, N)).astype(np.uint32)  # avoid 0-1 wrap
    zwords = np.zeros((G, N // 8), np.uint32)
    for i in range(8):
        zwords |= (z[:, i::8] - 1) << (4 * i)
    assert (unpack_gptq_qzeros(zwords.astype(np.int32), bits) == z).all()


def test_awq_unpack():
    """AWQ interleave order (0,2,4,6,1,3,5,7) along N."""
    rng = np.random.default_rng(3)
    K, N = 4, 16
    q = rng.integers(0, 16, (K, N)).astype(np.uint32)
    order = (0, 2, 4, 6, 1, 3, 5, 7)
    words = np.zeros((K, N // 8), np.uint32)
    for slot, col in enumerate(order):
        words |= q[:, col::8] << (4 * slot)
    assert (unpack_awq(words.astype(np.int32), 4) == q).all()


def test_gptq_act_order_matches_dense():
    """desc_act checkpoints: permuted rows + input_perm == original matmul."""
    from neural_magic_vllm_tpu.quantization.gptq import GPTQLinearMethod
    rng = np.random.default_rng(4)
    K, N, gs = 256, 128, 64
    G = K // gs
    q = rng.integers(0, 16, (K, N)).astype(np.uint32)
    # act-order reorders ROWS: each group still has exactly gs members
    g_idx = rng.permutation(np.arange(K) // gs).astype(np.int32)
    scales = (rng.uniform(0.5, 1.5, (G, N)) * 0.02).astype(np.float32)
    # dense golden respecting per-row group assignment
    w = (q.astype(np.float32) - 8.0) * scales[g_idx]
    words = np.zeros((K // 8, N), np.uint32)
    for i in range(8):
        words |= q[i::8] << (4 * i)
    method = GPTQLinearMethod(bits=4, group_size=gs, sym=True)
    params = method.convert_hf({"qweight": words.astype(np.int32),
                                "scales": scales, "g_idx": g_idx})
    assert "input_perm" in params
    params = {k: jnp.asarray(v) for k, v in params.items()}
    x = rng.standard_normal((9, K)).astype(np.float32)
    out = method.apply(params, jnp.asarray(x, jnp.float32))
    gold = x @ w
    rel = np.abs(np.asarray(out, np.float64) - gold).max() / \
        np.abs(gold).max()
    assert rel < 0.02, rel


def test_fp8_quant_and_mm():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.bfloat16)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    import ml_dtypes
    amax = np.abs(w).max()
    w_scale = amax / 448.0
    wq = np.clip(w / w_scale, -448, 448).astype(ml_dtypes.float8_e4m3fn)
    out = fp8_scaled_mm(x, jnp.asarray(wq), jnp.float32(w_scale))
    gold = np.asarray(x, np.float32) @ (wq.astype(np.float32) * w_scale)
    rel = np.abs(np.asarray(out, np.float64) - gold).max() / \
        np.abs(gold).max()
    assert rel < 0.03, rel

    xq, s = scaled_fp8_quant(jnp.asarray(x, jnp.float32))
    back = np.asarray(xq, np.float32) * float(s)
    xf = np.asarray(x, np.float32)
    # e4m3: 3 mantissa bits -> elementwise rel error <= 2^-4
    assert (np.abs(back - xf) <= np.abs(xf) * 0.0625 + 2 * float(s)).all()


def test_int8_quant_and_mm():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.1
    w_scale = np.abs(w).max(axis=0) / 127.0  # per-channel
    wq = np.clip(np.round(w / w_scale), -128, 127).astype(np.int8)
    out = int8_scaled_mm(x, jnp.asarray(wq), jnp.asarray(w_scale),
                         out_dtype=jnp.float32)
    gold = np.asarray(x) @ (wq.astype(np.float32) * w_scale)
    rel = np.abs(np.asarray(out, np.float64) - gold).max() / \
        np.abs(gold).max()
    assert rel < 0.02, rel

    xq, s = scaled_int8_quant(x)
    back = np.asarray(xq, np.float32) * float(s)
    assert np.abs(back - np.asarray(x)).max() <= float(s) * 0.51


def test_fused_moe_quant_vs_dense():
    """fused_moe over WNA16-packed expert stacks == fused_moe over the
    exactly-dequantized dense experts (reference fused_moe quantized-method
    seam, fused_moe/layer.py:36)."""
    from neural_magic_vllm_tpu.ops.moe import (fused_moe, fused_moe_quant,
                                               topk_softmax)
    from neural_magic_vllm_tpu.ops.quant import pack_int_tiled, select_k_tile

    rng = np.random.default_rng(11)
    E, H, I, T, topk, bits, gs = 4, 128, 256, 16, 2, 4, 64
    sym_z = float(1 << (bits - 1))

    def make(k, n):
        G = k // gs
        q = rng.integers(0, 2**bits, (E, k, n)).astype(np.uint32)
        scales = (rng.uniform(0.5, 1.5, (E, G, n)) * 0.02).astype(np.float32)
        dense = ((q.reshape(E, G, gs, n) - sym_z) *
                 scales.reshape(E, G, 1, n)).reshape(E, k, n)
        kt = select_k_tile(k, gs, bits)
        packed = np.stack([pack_int_tiled(q[e], bits, kt) for e in range(E)])
        return jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(dense)

    gq, gs_a, gd = make(H, I)
    uq, us, ud = make(H, I)
    dq, ds, dd = make(I, H)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    weights, ids = topk_softmax(logits, topk)

    experts = {"w_gate_q": gq, "w_gate_s": gs_a, "w_up_q": uq, "w_up_s": us,
               "w_down_q": dq, "w_down_s": ds}
    out_q = fused_moe_quant(x, experts, weights, ids, bits=bits,
                            group_size=gs)
    out_d = fused_moe(x, gd, ud, dd, weights, ids)
    # default path = grouped Pallas kernel contracting in bf16; golden in
    # f32 — abs tolerance must track output magnitude
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("name,hidden,intermediate", [
    ("mixtral-8x7b", 4096, 14336),
    ("mixtral-8x22b", 6144, 16384),
    ("qwen2-57b-a14b", 3584, 2560),
    ("deepseek-v2", 5120, 1536),
    ("deepseek-v2-lite", 2048, 1408),
    ("scaled-bench", 2048, 4096),
])
@pytest.mark.parametrize("group_size", [128, -1])
def test_moe_grouped_fast_path_at_real_geometry(name, hidden, intermediate,
                                                group_size):
    """Every real W4A16 MoE checkpoint geometry must take the grouped
    Pallas dequant-GEMM path, not the dequantizing fallback (VERDICT r3
    ask #9; reference tunes per-(E,N) configs instead,
    fused_moe/fused_moe.py:402-527). If a future kernel change breaks a
    precondition at one of these shapes, this test names the shape."""
    from neural_magic_vllm_tpu.ops.moe import grouped_fast_path_ok
    assert grouped_fast_path_ok(hidden, intermediate, bits=4,
                                group_size=group_size), (name, group_size)


def test_moe_grouped_fast_path_rejects_bad_geometry():
    """Shapes that violate the kernel preconditions (non-128-multiple
    output dim; contraction dim with no valid K tile) must fall back."""
    from neural_magic_vllm_tpu.ops.moe import grouped_fast_path_ok
    assert not grouped_fast_path_ok(4096, 14400, bits=4, group_size=128)
    assert not grouped_fast_path_ok(100, 256, bits=4, group_size=128)


@pytest.mark.parametrize("skew", ["balanced", "one_hot", "empty_expert"])
def test_fused_moe_quant_grouped_vs_dequant(skew):
    """Grouped Pallas dequant-GEMM MoE == the dequantize-everything
    fallback, including degenerate routings: all tokens on one expert and
    experts that receive zero tokens (reference moe_align_block_size
    sentinel-padding contract, fused_moe.py:166-221)."""
    from neural_magic_vllm_tpu.ops.moe import (fused_moe_quant_dequant,
                                               fused_moe_quant_grouped,
                                               topk_softmax)

    rng = np.random.default_rng(7)
    E, H, I, T, topk, bits, gs = 8, 256, 512, 40, 2, 4, 128

    def make(k, n):
        q = rng.integers(0, 2**bits, (E, k, n)).astype(np.uint32)
        scales = (rng.uniform(0.5, 1.5, (E, k // gs, n)) *
                  0.02).astype(np.float32)
        kt = select_k_tile(k, gs, bits)
        packed = np.stack([pack_int_tiled(q[e], bits, kt)
                           for e in range(E)])
        return jnp.asarray(packed), jnp.asarray(scales)

    gq, gsc = make(H, I)
    uq, usc = make(H, I)
    dq, dsc = make(I, H)
    experts = {"w_gate_q": gq, "w_gate_s": gsc, "w_up_q": uq, "w_up_s": usc,
               "w_down_q": dq, "w_down_s": dsc}
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    if skew == "one_hot":
        ids = jnp.full((T, topk), 3, jnp.int32)
        weights = jnp.full((T, topk), 1.0 / topk, jnp.float32)
    elif skew == "empty_expert":
        # only experts {0, 5} ever selected; six experts get zero rows
        ids = jnp.asarray(rng.choice([0, 5], size=(T, topk)), jnp.int32)
        weights = jnp.full((T, topk), 1.0 / topk, jnp.float32)
    else:
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        weights, ids = topk_softmax(logits, topk)
    out_g = fused_moe_quant_grouped(x, experts, weights, ids, bits=bits,
                                    group_size=gs)
    out_d = fused_moe_quant_dequant(x, experts, weights, ids, bits=bits,
                                    group_size=gs)
    # the grouped kernel contracts in bf16 (the golden in f32): abs error
    # scales with output magnitude (~8 here), not with a fixed atol
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               rtol=2e-2, atol=6e-2)


@pytest.mark.parametrize("gs,K,N,M,zeros", [
    (128, 1024, 512, 8, True),
    (128, 512, 256, 64, False),
    (-1, 512, 256, 33, False),
])
def test_quant_matmul_w4a8_vs_golden(gs, K, N, M, zeros):
    """W4A8 path (act_int8=True): int8-activation integer dots must match
    the exact integer-math golden (same per-row quant simulated in numpy),
    and stay close to the bf16 dequant product."""
    bits = 4
    rng = np.random.default_rng(7)
    kt = select_k_tile(K, gs, bits)
    gse = K if gs == -1 else gs
    G = K // gse
    q = rng.integers(0, 2**bits, (K, N)).astype(np.uint32)
    packed = jnp.asarray(pack_int_tiled(q, bits, kt))
    scales = (rng.uniform(0.5, 1.5, (G, N)) * 0.01).astype(np.float32)
    z = rng.integers(0, 2**bits, (G, N)).astype(np.float32) if zeros \
        else np.full((G, N), 8.0, np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)

    # integer-math golden with the SAME per-row symmetric act quant
    import ml_dtypes
    xb = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    a_scale = np.maximum(np.abs(xb).max(axis=1, keepdims=True), 1e-8) / 127.0
    x8 = np.clip(np.round(xb / a_scale), -127, 127).astype(np.int64)
    wq = (q.astype(np.int64).reshape(G, gse, N) -
          z.astype(np.int64).reshape(G, 1, N))
    gold = np.zeros((M, N), np.float64)
    for g in range(G):
        dot = x8[:, g * gse:(g + 1) * gse] @ wq[g]
        gold += dot.astype(np.float64) * scales[g][None, :]
    gold *= a_scale.astype(np.float64)

    zj = jnp.asarray(z) if zeros else None
    out = quant_matmul_pallas(jnp.asarray(x, jnp.bfloat16), packed,
                              jnp.asarray(scales), zj, bits=bits, k_tile=kt,
                              group_size=gs, act_int8=True)
    norm = np.abs(gold).max()
    rel = np.abs(np.asarray(out, np.float64) - gold).max() / norm
    assert rel < 5e-3, rel  # f32 accum vs f64 golden only

    # and the a8 result is close to the bf16 dequant product (act-quant
    # noise bounded)
    w = ((q.reshape(G, gse, N) - z.reshape(G, 1, N)) *
         scales.reshape(G, 1, N)).reshape(K, N)
    dense = x @ w
    rel_d = np.abs(np.asarray(out, np.float64) - dense).max() / \
        np.abs(dense).max()
    assert rel_d < 0.05, rel_d


@pytest.mark.parametrize("bits,N", [(4, 513), (8, 640)])
def test_quant_matmul_act_int8_fallback_paths(bits, N):
    """Regression (code review round 2): (a) the odd-N XLA fallback must
    run on the ORIGINAL activations, not the already-int8-quantized ones;
    (b) bits=8 + act_int8 must not wrap unsigned levels through int8 —
    both must match the dequant golden."""
    gs, K, M = 128, 512, 8
    rng = np.random.default_rng(11)
    kt = select_k_tile(K, gs, bits)
    G = K // gs
    q = rng.integers(0, 2**bits, (K, N)).astype(np.uint32)
    packed = jnp.asarray(pack_int_tiled(q, bits, kt))
    scales = (rng.uniform(0.5, 1.5, (G, N)) * 0.01).astype(np.float32)
    zp = float(2**(bits - 1))
    x = rng.standard_normal((M, K)).astype(np.float32)

    w = ((q.reshape(G, gs, N) - zp) * scales.reshape(G, 1, N)) \
        .reshape(K, N)
    dense = x @ w

    out = quant_matmul_pallas(jnp.asarray(x, jnp.bfloat16), packed,
                              jnp.asarray(scales), None, bits=bits,
                              k_tile=kt, group_size=gs, act_int8=True)
    norm = np.abs(dense).max()
    rel = np.abs(np.asarray(out, np.float64) - dense).max() / norm
    assert rel < 3e-2, rel
