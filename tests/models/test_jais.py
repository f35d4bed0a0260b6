"""JAIS vs an independent numpy golden (no offline HF class): GPT-2 layout
with ALiBi, 1/d attention scaling, muP embedding/logit scales, swiglu MLP
where c_fc2 gates c_fc."""
import json
import os

import numpy as np

from tests.utils import create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]

NH, HD, H, I, L, V = 4, 16, 64, 48, 2, 512
EPS = 1e-5
EMB_SCALE, OUT_ALPHA, WIDTH_SCALE = 2.0, 0.5, 1.5


def _make_ckpt(d):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(1)

    def u(*shape):
        return (rng.uniform(-1, 1, shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {"transformer.wte.weight": u(V, H)}
    for key in ("transformer.ln_f", ):
        t[key + ".weight"] = np.ones(H, np.float32) + u(H) * 0.1
        t[key + ".bias"] = u(H) * 0.1
    for i in range(L):
        p = f"transformer.h.{i}."
        for key in ("ln_1", "ln_2"):
            t[p + key + ".weight"] = np.ones(H, np.float32) + u(H) * 0.1
            t[p + key + ".bias"] = u(H) * 0.1
        t[p + "attn.c_attn.weight"] = u(H, 3 * H)  # conv1d [in, out]
        t[p + "attn.c_attn.bias"] = u(3 * H) * 0.1
        t[p + "attn.c_proj.weight"] = u(H, H)
        t[p + "attn.c_proj.bias"] = u(H) * 0.1
        t[p + "mlp.c_fc.weight"] = u(H, I)
        t[p + "mlp.c_fc.bias"] = u(I) * 0.1
        t[p + "mlp.c_fc2.weight"] = u(H, I)
        t[p + "mlp.c_fc2.bias"] = u(I) * 0.1
        t[p + "mlp.c_proj.weight"] = u(I, H)
        t[p + "mlp.c_proj.bias"] = u(H) * 0.1
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "jais", "architectures": ["JAISLMHeadModel"],
        "vocab_size": V, "n_positions": 256, "n_embd": H, "n_layer": L,
        "n_head": NH, "n_inner": I, "activation_function": "swiglu",
        "layer_norm_epsilon": EPS, "position_embedding_type": "alibi",
        "mup_embeddings_scale": EMB_SCALE, "mup_output_alpha": OUT_ALPHA,
        "mup_width_scale": WIDTH_SCALE, "mup_scale_qk_dot_by_d": True,
        "tie_word_embeddings": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return t


def _np_forward(t, ids):
    from neural_magic_vllm_tpu.ops.attention import get_alibi_slopes
    slopes = np.asarray(get_alibi_slopes(NH), np.float64)

    def ln(x, p):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean)**2).mean(-1, keepdims=True)
        return (x - mean) / np.sqrt(var + EPS) * t[p + ".weight"] + \
            t[p + ".bias"]

    x = t["transformer.wte.weight"][np.asarray(ids)] * EMB_SCALE
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    bias = slopes[:, None, None] * (pos[None, None, :] - pos[None, :, None])
    bias = np.where(pos[None, :] <= pos[:, None], bias, -np.inf)
    for i in range(L):
        p = f"transformer.h.{i}."
        h = ln(x, p + "ln_1")
        qkv = h @ t[p + "attn.c_attn.weight"] + t[p + "attn.c_attn.bias"]
        q = qkv[:, :H].reshape(T, NH, HD)
        k = qkv[:, H:2 * H].reshape(T, NH, HD)
        v = qkv[:, 2 * H:].reshape(T, NH, HD)
        logits = np.einsum("qhd,khd->hqk", q, k) / HD + bias  # 1/d scale
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", w, v).reshape(T, H)
        x = x + o @ t[p + "attn.c_proj.weight"] + t[p + "attn.c_proj.bias"]
        h2 = ln(x, p + "ln_2")
        gate = h2 @ t[p + "mlp.c_fc2.weight"] + t[p + "mlp.c_fc2.bias"]
        up = h2 @ t[p + "mlp.c_fc.weight"] + t[p + "mlp.c_fc.bias"]
        mlp = (gate / (1 + np.exp(-gate)) * up) @ \
            t[p + "mlp.c_proj.weight"] + t[p + "mlp.c_proj.bias"]
        x = x + mlp
    x = ln(x, "transformer.ln_f")
    return x @ t["transformer.wte.weight"].T * (OUT_ALPHA * WIDTH_SCALE)


def test_jais_vs_numpy_golden(tmp_path):
    d = str(tmp_path / "jais")
    t = _make_ckpt(d)

    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=d, dtype="float32", max_model_len=128, block_size=16,
              num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    for prompt, out in zip(PROMPTS, outs):
        seq = list(prompt)
        for tok in out.outputs[0].token_ids:
            logits = _np_forward(t, seq)[-1]
            top = int(np.argmax(logits))
            assert tok == top or \
                abs(logits[tok] - logits[top]) < 2e-3, (seq, tok, top)
            seq.append(tok)
