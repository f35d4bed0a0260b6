"""SqueezeLLM / AQLM / DeepSpeedFP / BitsAndBytes-NF4 methods: engine
output with quantized weights must exactly equal the engine over an fp32
checkpoint holding the numpy-dequantized weights (both paths compute
x @ dequant(W) in f32), mirroring the reference's dequant+matmul kernel
goldens (tests/kernels/test_marlin_gemm.py style)."""
import json
import os

import numpy as np
import pytest

from tests.utils import create_tiny_llama_checkpoint, create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]

_LINEAR_SUFFIXES = (
    "self_attn.q_proj.weight", "self_attn.k_proj.weight",
    "self_attn.v_proj.weight", "self_attn.o_proj.weight",
    "mlp.gate_proj.weight", "mlp.up_proj.weight", "mlp.down_proj.weight")


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant_extra") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=64,
                                        intermediate_size=128,
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
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def _write_ckpt(src_dir, dst, tensors, quant_cfg=None):
    from safetensors.numpy import save_file
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


def _is_linear(name):
    return any(name.endswith(s) for s in _LINEAR_SUFFIXES)


def test_squeezellm(tiny_llama, tmp_path):
    from safetensors.numpy import load_file
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    from neural_magic_vllm_tpu.quantization.squeezellm import \
        pack_squeezellm
    q_t, fp_t = {}, {}
    for name, w in src.items():
        if not _is_linear(name):
            q_t[name] = fp_t[name] = w
            continue
        wt = w.T.astype(np.float32)  # [K, N]
        K, N = wt.shape
        # per-column 16-level uniform codebook (stands in for k-means)
        lo, hi = wt.min(0), wt.max(0)
        lut = (lo[:, None] + (hi - lo)[:, None] *
               np.linspace(0, 1, 16)[None, :]).astype(np.float32)  # [N,16]
        levels = np.abs(wt[:, :, None] - lut[None, :, :]).argmin(-1)
        deq = np.take_along_axis(lut, levels.T, axis=1).T  # [K, N]
        base = name[:-len(".weight")]
        q_t[base + ".qweight"] = pack_squeezellm(
            levels.astype(np.uint32), 4)
        q_t[base + ".lookup_table"] = lut
        fp_t[name] = deq.T.astype(np.float32)
    qd = _write_ckpt(tiny_llama, str(tmp_path / "sq"), q_t,
                     {"quant_method": "squeezellm", "wbits": 4})
    fd = _write_ckpt(tiny_llama, str(tmp_path / "sq_fp"), fp_t)
    assert _greedy(qd) == _greedy(fd)


def test_aqlm(tiny_llama, tmp_path):
    from safetensors.numpy import load_file
    rng = np.random.default_rng(0)
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    ig, og, ncb, nbits = 8, 1, 2, 8
    size = 2**nbits
    q_t, fp_t = {}, {}
    for name, w in src.items():
        if not _is_linear(name):
            q_t[name] = fp_t[name] = w
            continue
        N, K = w.shape
        codes = rng.integers(0, size, (N // og, K // ig, ncb)).astype(
            np.int32)
        codebooks = (rng.standard_normal(
            (ncb, size, og, ig)) / np.sqrt(K) / ncb).astype(np.float32)
        scales = rng.uniform(0.5, 1.5, (N // og, 1, 1, 1)).astype(
            np.float32)
        deq = np.zeros((N // og, K // ig, og, ig), np.float32)
        for c in range(ncb):
            deq += codebooks[c][codes[:, :, c]]
        deq = (deq * scales).transpose(0, 2, 1, 3).reshape(N, K)
        base = name[:-len(".weight")]
        q_t[base + ".codes"] = codes
        q_t[base + ".codebooks"] = codebooks
        q_t[base + ".scales"] = scales
        fp_t[name] = deq
    q_cfg = {"quant_method": "aqlm", "in_group_size": ig,
             "out_group_size": og, "num_codebooks": ncb,
             "nbits_per_codebook": nbits}
    qd = _write_ckpt(tiny_llama, str(tmp_path / "aqlm"), q_t, q_cfg)
    fd = _write_ckpt(tiny_llama, str(tmp_path / "aqlm_fp"), fp_t)
    assert _greedy(qd) == _greedy(fd)


def test_deepspeedfp(tiny_llama, tmp_path):
    import jax.numpy as jnp
    from safetensors.numpy import load_file
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    fp_t = {}
    for name, w in src.items():
        if not _is_linear(name):
            fp_t[name] = w
            continue
        wt = w.T.astype(np.float32)
        scale = np.maximum(np.abs(wt).max(0, keepdims=True), 1e-12) / 448.0
        deq = np.asarray(
            jnp.asarray(wt / scale).astype(jnp.float8_e4m3fn).astype(
                jnp.float32)) * scale
        fp_t[name] = deq.T.astype(np.float32)
    fd = _write_ckpt(tiny_llama, str(tmp_path / "ds_fp"), fp_t)
    assert _greedy(tiny_llama, quantization="deepspeedfp") == _greedy(fd)


def test_bitsandbytes_nf4(tiny_llama, tmp_path):
    from safetensors.numpy import load_file
    from neural_magic_vllm_tpu.quantization.bitsandbytes import (NF4_TABLE,
                                                                 _BLOCK)
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    fp_t = {}
    for name, w in src.items():
        if not _is_linear(name):
            fp_t[name] = w
            continue
        wt = w.T.astype(np.float32)
        K, N = wt.shape
        pad = (-K) % _BLOCK
        wp = np.concatenate([wt, np.zeros((pad, N), np.float32)]) if pad \
            else wt
        blocks = wp.reshape(-1, _BLOCK, N)
        absmax = np.maximum(np.abs(blocks).max(1), 1e-12)
        normed = blocks / absmax[:, None, :]
        codes = np.abs(normed.reshape(-1, 1) -
                       NF4_TABLE[None]).argmin(1).reshape(wp.shape)
        deq = (NF4_TABLE[codes].reshape(-1, _BLOCK, N) *
               absmax[:, None, :]).reshape(wp.shape)[:K]
        fp_t[name] = deq.T.astype(np.float32)
    fd = _write_ckpt(tiny_llama, str(tmp_path / "bnb_fp"), fp_t)
    assert _greedy(tiny_llama, quantization="bitsandbytes") == _greedy(fd)


@pytest.mark.parametrize("bits", [4, 6, 12])
def test_deepspeedfp_6_12bit(tiny_llama, tmp_path, bits):
    """fp4 (e2m1) / fp6 (e3m2) / fp12 (e4m7) storage: engine over
    LUT-coded weights == engine over the host-dequantized fp32 twin
    (reference deepspeedfp supports 4/6/8/12 bits; so do we)."""
    from safetensors.numpy import load_file
    from neural_magic_vllm_tpu.quantization.deepspeedfp import (
        _FORMATS, _float_grid, _quantize_to_grid)
    eb, mb = _FORMATS[bits]
    grid = _float_grid(eb, mb)
    fmax = float(np.max(grid))
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    fp_t = {}
    for name, w in src.items():
        if not _is_linear(name):
            fp_t[name] = w
            continue
        wt = w.T.astype(np.float32)
        scale = np.maximum(np.abs(wt).max(0, keepdims=True), 1e-12) / fmax
        codes = _quantize_to_grid(wt / scale, grid)
        fp_t[name] = (grid[codes] * scale).T.astype(np.float32)
    qd = _write_ckpt(tiny_llama, str(tmp_path / f"ds_src{bits}"), src,
                     {"quant_method": "deepspeedfp", "bits": bits})
    fd = _write_ckpt(tiny_llama, str(tmp_path / f"ds_fp{bits}"), fp_t)
    assert _greedy(qd) == _greedy(fd)
