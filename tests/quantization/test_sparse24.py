"""2:4 semi-structured sparse datapath (ops/sparse24.py +
quantization/marlin_24.py + sparsity.py).

Golden strategy mirrors the reference's marlin_24 kernel tests
(tests/kernels/test_marlin_gemm.py): kernel output vs dequant+matmul, and
the checkpoint decoder vs the reference's own torch format helpers
(utils/format_24.py / marlin_24_perms.py, loaded standalone from the
read-only reference tree when present)."""
import importlib.util
import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.sparse24 import (
    compress_24, pack_sparse24, pack_sparse24_bf16, select_k_tile_24,
    sparse24_bf16_matmul_ref, sparse24_dequant_ref, sparse24_matmul_pallas,
    sparse24_matmul_ref)

_REF_UTILS = ("/root/reference/vllm/model_executor/layers/quantization/"
              "utils")


def _random_24_levels(rng, K, N, bits):
    """[K, N] uint levels with the zero point at >= 2 slots per quad."""
    zp = 1 << (bits - 1)
    q = rng.integers(0, 1 << bits, (K, N), dtype=np.int64)
    quads = q.reshape(K // 4, 4, N)
    kill = np.argsort(rng.random((K // 4, 4, N)), axis=1)[:, :2, :]
    np.put_along_axis(quads, kill, zp, axis=1)
    return quads.reshape(K, N).astype(np.uint32)


def _dequant(levels, scales, bits, group_size):
    K, N = levels.shape
    zp = 1 << (bits - 1)
    gs = K if group_size in (-1, None) else group_size
    signed = levels.astype(np.float32) - zp
    return (signed.reshape(-1, gs, N) *
            scales.reshape(-1, 1, N)).reshape(K, N)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [-1, 128])
def test_pack_dequant_roundtrip(bits, group_size):
    rng = np.random.default_rng(0)
    K, N = 512, 256
    levels = _random_24_levels(rng, K, N, bits)
    G = 1 if group_size == -1 else K // group_size
    scales = rng.uniform(0.5, 2.0, (G, N)).astype(np.float32)
    kt = select_k_tile_24(K, group_size)
    vals, pos = compress_24(levels, float(1 << (bits - 1)))
    vp, meta = pack_sparse24(vals, pos, bits, kt)
    w = sparse24_dequant_ref(jnp.asarray(vp), jnp.asarray(meta),
                             jnp.asarray(scales), bits, kt, K, group_size,
                             jnp.float32)
    np.testing.assert_allclose(np.asarray(w),
                               _dequant(levels, scales, bits, group_size),
                               rtol=0, atol=0)


def test_compress_rejects_dense():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 15, (8, 4), dtype=np.int64).astype(np.uint32)
    q[q == 8] = 9  # no zero-point entries at all -> 4 kept per quad
    with pytest.raises(ValueError, match="not 2:4"):
        compress_24(q, 8.0)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [-1, 128])
@pytest.mark.parametrize("K,N,M", [(256, 256, 3), (512, 384, 16)])
def test_sparse24_kernel_vs_ref(bits, group_size, K, N, M):
    rng = np.random.default_rng(2)
    levels = _random_24_levels(rng, K, N, bits)
    G = 1 if group_size == -1 else K // group_size
    scales = rng.uniform(0.5, 2.0, (G, N)).astype(np.float32) * 0.01
    kt = select_k_tile_24(K, group_size)
    vals, pos = compress_24(levels, float(1 << (bits - 1)))
    vp, meta = pack_sparse24(vals, pos, bits, kt)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    ref = sparse24_matmul_ref(x, jnp.asarray(vp), jnp.asarray(meta),
                              jnp.asarray(scales), bits, kt, group_size)
    out = sparse24_matmul_pallas(x, jnp.asarray(vp), jnp.asarray(meta),
                                 jnp.asarray(scales), bits=bits, k_tile=kt,
                                 group_size=group_size)
    # ref rounds scale*level to bf16 before the dot; the kernel scales
    # post-dot in f32 — differences are bf16-weight rounding only
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=0.1)


def test_sparse24_bf16_kernel_vs_dense():
    rng = np.random.default_rng(3)
    K, N, M = 512, 256, 5
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    quads = w.reshape(K // 4, 4, N)
    order = np.argsort(np.abs(quads), axis=1)
    np.put_along_axis(quads, order[:, :2, :], 0.0, axis=1)
    w = quads.reshape(K, N)
    kt = select_k_tile_24(K, -1)
    vals, meta = pack_sparse24_bf16(w, kt)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    dense = jnp.dot(x, jnp.asarray(w, jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    va = jnp.asarray(vals, jnp.bfloat16)
    ref = sparse24_bf16_matmul_ref(x, va, jnp.asarray(meta), kt)
    out = sparse24_matmul_pallas(x, va, jnp.asarray(meta), None, bits=None,
                                 k_tile=kt, group_size=-1)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(dense), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2,
                               atol=2e-2)


# --- checkpoint-format decoder vs the reference torch helpers ---------------
def _load_ref_module(name):
    path = os.path.join(_REF_UTILS, name + ".py")
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _marlin24_encode(levels, scales, bits, group_size):
    """Build checkpoint tensors (B_24, B_meta, s) from dense levels using
    the REFERENCE's own compression + permutation tables — the decoder
    under test must invert this exactly."""
    import torch
    fmt = _load_ref_module("format_24")
    perms = _load_ref_module("marlin_24_perms")
    K, N = levels.shape
    zp = 1 << (bits - 1)
    signed = torch.from_numpy(
        (levels.astype(np.int64) - zp).astype(np.int32))
    comp_nk, meta = fmt.sparse_semi_structured_from_dense_cutlass(
        signed.t().contiguous())
    comp = (comp_nk.t().contiguous().numpy().astype(np.int64) +
            zp).astype(np.uint32)  # [K/2, N]
    # 16x16 tiling + fragment permutation + column-interleaved packing
    # (reference marlin_utils.marlin_weights semantics)
    Kc = K // 2
    perm = perms.marlin_24_perm[bits].numpy()
    tiled = comp.reshape(Kc // 16, 16, N // 16, 16).transpose(
        0, 2, 1, 3).reshape(Kc // 16, N * 16)
    tiled = tiled.reshape(-1, perm.size)[:, perm].reshape(Kc // 16, N * 16)
    pf = 32 // bits
    packed = np.zeros((Kc // 16, N * 16 // pf), np.uint32)
    for i in range(pf):
        packed |= tiled[:, i::pf] << (bits * i)
    s = scales
    if group_size not in (-1, None) and group_size < K:
        sp = np.array(perms.marlin_24_scale_perm[bits])
        s = scales.reshape(-1, sp.size)[:, sp].reshape(-1, N)
    return (packed.astype(np.int32),
            meta.numpy().reshape(K // 32, 2 * N),
            s.astype(np.float16))


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [-1, 128])
def test_marlin24_decode_matches_reference_format(bits, group_size):
    from neural_magic_vllm_tpu.quantization.marlin_24 import decode_marlin24
    rng = np.random.default_rng(4)
    K, N = 256, 64
    levels = _random_24_levels(rng, K, N, bits)
    G = 1 if group_size == -1 else K // group_size
    scales = rng.uniform(0.5, 2.0, (G, N)).astype(np.float32)
    b24, bmeta, s = _marlin24_encode(levels, scales, bits, group_size)
    dec_levels, dec_scales = decode_marlin24(b24, bmeta, s, bits, group_size)
    # dequantized weights must match exactly (kept positions for all-zero
    # quads may differ, but such slots dequantize to 0 either way)
    np.testing.assert_array_equal(
        _dequant(dec_levels, dec_scales, bits, group_size),
        _dequant(levels, scales.astype(np.float16).astype(np.float32), bits,
                 group_size))


# --- e2e: engine over sparse checkpoints vs dense-dequantized twins ---------
_LINEAR_SUFFIXES = (
    "self_attn.q_proj.weight", "self_attn.k_proj.weight",
    "self_attn.v_proj.weight", "self_attn.o_proj.weight",
    "mlp.gate_proj.weight", "mlp.up_proj.weight", "mlp.down_proj.weight")
_PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]


@pytest.fixture(scope="module")
def sparse_llama(tmp_path_factory):
    """Tiny llama with K dims that admit the 256-wide sparse tile."""
    from tests.utils import create_tiny_llama_checkpoint
    d = tmp_path_factory.mktemp("sparse24") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=256,
                                        intermediate_size=512,
                                        num_hidden_layers=2,
                                        num_attention_heads=4,
                                        num_key_value_heads=4)


def _greedy(model_dir, **kw):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=_PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def _write_ckpt(src_dir, dst, tensors, quant_cfg=None):
    from safetensors.numpy import save_file
    from tests.utils import create_tiny_tokenizer
    os.makedirs(dst, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              os.path.join(dst, "model.safetensors"))
    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    if quant_cfg is not None:
        cfg["quantization_config"] = quant_cfg
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(dst, vocab_size=cfg["vocab_size"])
    return dst


def test_marlin24_engine_matches_dense_twin(sparse_llama, tmp_path):
    """Engine over a gptq_marlin_24 checkpoint == engine over an fp32
    checkpoint holding the dequantized weights (reference parity:
    tests/models_core quantized-vs-dense goldens)."""
    from safetensors.numpy import load_file
    if not os.path.exists(_REF_UTILS):
        pytest.skip("reference tree not mounted")
    bits, group_size = 4, 128
    zp = 1 << (bits - 1)
    src = load_file(os.path.join(sparse_llama, "model.safetensors"))
    q_t, fp_t = {}, {}
    for name, w in src.items():
        if not any(name.endswith(sfx) for sfx in _LINEAR_SUFFIXES):
            q_t[name] = fp_t[name] = w
            continue
        wt = w.T.astype(np.float32)  # [K, N]
        K, N = wt.shape
        g = wt.reshape(K // group_size, group_size, N)
        scales = (np.abs(g).max(axis=1) / (zp - 1)).astype(np.float32)
        scales = np.maximum(scales, 1e-8)
        levels = np.clip(
            np.rint(g / scales[:, None, :]) + zp, 0,
            2 * zp - 1).reshape(K, N)
        quads = levels.reshape(K // 4, 4, N)
        mag = np.abs(quads - zp)
        drop = np.argsort(mag, axis=1, kind="stable")[:, :2, :]
        np.put_along_axis(quads, drop, zp, axis=1)
        levels = quads.reshape(K, N).astype(np.uint32)
        b24, bmeta, s = _marlin24_encode(levels, scales, bits, group_size)
        base = name[:-len(".weight")]
        q_t[base + ".B_24"] = b24
        q_t[base + ".B_meta"] = bmeta
        q_t[base + ".s"] = s
        fp_t[name] = _dequant(
            levels, s.astype(np.float32) if group_size in (-1, None) else
            scales.astype(np.float16).astype(np.float32), bits,
            group_size).T.astype(np.float32)
    q_cfg = {"quant_method": "gptq", "bits": bits,
             "group_size": group_size, "sym": True, "desc_act": False,
             "checkpoint_format": "marlin_24"}
    qd = _write_ckpt(sparse_llama, str(tmp_path / "m24"), q_t, q_cfg)
    fd = _write_ckpt(sparse_llama, str(tmp_path / "m24_fp"), fp_t)
    ref = _greedy(qd)
    assert ref == _greedy(fd)
    # TP=2 over the compressed checkpoint must agree as well (packed
    # vals/meta/scales shard with their logical weight dimension).
    assert _greedy(qd, tensor_parallel_size=2) == ref


def test_semi_structured_sparsity_matches_dense(sparse_llama, tmp_path):
    """--sparsity semi_structured_sparse_w16a16 over a 2:4-pruned
    checkpoint == dense execution of the same checkpoint (compression is
    an exact selection)."""
    from safetensors.numpy import load_file
    src = load_file(os.path.join(sparse_llama, "model.safetensors"))
    t = {}
    for name, w in src.items():
        if not any(name.endswith(sfx) for sfx in _LINEAR_SUFFIXES):
            t[name] = w
            continue
        wt = w.T.astype(np.float32)
        K, N = wt.shape
        quads = wt.reshape(K // 4, 4, N)
        order = np.argsort(np.abs(quads), axis=1)
        np.put_along_axis(quads, order[:, :2, :], 0.0, axis=1)
        t[name] = quads.reshape(K, N).T
    d = _write_ckpt(sparse_llama, str(tmp_path / "sp24"), t)
    assert _greedy(d, sparsity="semi_structured_sparse_w16a16") == \
        _greedy(d)


def test_semi_structured_sparsity_tp2_matches_tp1(sparse_llama, tmp_path):
    """Sparse 2:4 datapath under tensor parallelism: TP=2 greedy must
    exactly match TP=1 (compressed vals/meta shard with their logical
    weight; reference parity: tests/distributed quantized TP matrix)."""
    from safetensors.numpy import load_file
    src = load_file(os.path.join(sparse_llama, "model.safetensors"))
    t = {}
    for name, w in src.items():
        if not any(name.endswith(sfx) for sfx in _LINEAR_SUFFIXES):
            t[name] = w
            continue
        wt = w.T.astype(np.float32)
        K, N = wt.shape
        quads = wt.reshape(K // 4, 4, N)
        order = np.argsort(np.abs(quads), axis=1)
        np.put_along_axis(quads, order[:, :2, :], 0.0, axis=1)
        t[name] = quads.reshape(K, N).T
    d = _write_ckpt(sparse_llama, str(tmp_path / "sp24tp"), t)
    ref = _greedy(d, sparsity="semi_structured_sparse_w16a16")
    assert _greedy(d, sparsity="semi_structured_sparse_w16a16",
                   tensor_parallel_size=2) == ref


def test_linear_method_convert_and_apply():
    from neural_magic_vllm_tpu.quantization.marlin_24 import \
        Marlin24LinearMethod
    rng = np.random.default_rng(5)
    bits, group_size = 4, 128
    K, N = 256, 64
    levels = _random_24_levels(rng, K, N, bits)
    scales = rng.uniform(0.5, 2.0, (K // group_size, N)).astype(np.float32)
    b24, bmeta, s = _marlin24_encode(levels, scales, bits, group_size)
    lm = Marlin24LinearMethod(bits, group_size)
    params = lm.convert_hf({"B_24": b24, "B_meta": bmeta, "s": s})
    x = jnp.asarray(rng.standard_normal((3, K)), jnp.float32)
    out = lm.apply({k: jnp.asarray(v) for k, v in params.items()}, x)
    w = _dequant(levels, scales.astype(np.float16).astype(np.float32),
                 bits, group_size)
    ref = np.asarray(x, np.float32) @ w
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-5,
                               atol=1e-5)
