"""Arctic vs an independent numpy golden: alternating dense/MoE layers at
moe_layer_frequency=2, parallel residual_mlp + MoE branches on MoE layers
(the MoE branch reads the normed PRE-attention residual input)."""
import json
import os

import numpy as np

from tests.utils import create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]

NH, HD, H, L, V = 4, 16, 64, 2, 512
I, E, TOPK = 96, 4, 2
EPS = 1e-6


def _make_ckpt(d):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(11)

    def u(*shape):
        return (rng.uniform(-1, 1, shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {
        "model.embed_tokens.weight": u(V, H),
        "model.norm.weight": np.ones(H, np.float32) + u(H) * 0.1,
        "lm_head.weight": u(V, H),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32) + \
            u(H) * 0.1
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32) \
            + u(H) * 0.1
        for proj, shape in (("q_proj", (NH * HD, H)),
                            ("k_proj", (NH * HD, H)),
                            ("v_proj", (NH * HD, H)),
                            ("o_proj", (H, NH * HD))):
            t[p + f"self_attn.{proj}.weight"] = u(*shape)
        if (i + 1) % 2 != 0:  # dense layer (even idx)
            t[p + "block_sparse_moe.mlp.w1.weight"] = u(I, H)
            t[p + "block_sparse_moe.mlp.w3.weight"] = u(I, H)
            t[p + "block_sparse_moe.mlp.w2.weight"] = u(H, I)
        else:  # MoE layer with parallel residual mlp
            t[p + "block_sparse_moe.gate.weight"] = u(E, H)
            for e in range(E):
                t[p + f"block_sparse_moe.experts.{e}.w1.weight"] = u(I, H)
                t[p + f"block_sparse_moe.experts.{e}.w3.weight"] = u(I, H)
                t[p + f"block_sparse_moe.experts.{e}.w2.weight"] = u(H, I)
            t[p + "residual_layernorm.weight"] = np.ones(H, np.float32) + \
                u(H) * 0.1
            t[p + "residual_mlp.w1.weight"] = u(H, H)
            t[p + "residual_mlp.w3.weight"] = u(H, H)
            t[p + "residual_mlp.w2.weight"] = u(H, H)
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "arctic", "architectures": ["ArcticForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NH, "num_local_experts": E,
        "num_experts_per_tok": TOPK, "moe_layer_frequency": 2,
        "use_residual": True, "max_position_embeddings": 256,
        "rms_norm_eps": EPS, "rope_theta": 10000.0,
        "tie_word_embeddings": False,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return t


def _np_forward(t, ids):
    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + EPS) * w

    def swiglu(h, p):
        g = h @ t[p + "w1.weight"].T
        u = h @ t[p + "w3.weight"].T
        return (g / (1 + np.exp(-g)) * u) @ t[p + "w2.weight"].T

    def rope(x, pos):
        inv_freq = 1.0 / (10000.0**(np.arange(0, HD, 2, np.float64) / HD))
        freqs = pos[:, None] * inv_freq[None, :]
        c, s = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
        x1, x2 = x[..., :HD // 2], x[..., HD // 2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)

    x = t["model.embed_tokens.weight"][np.asarray(ids)]
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    mask = pos[None, :] <= pos[:, None]
    for i in range(L):
        p = f"model.layers.{i}."
        residual_input = x
        h = rmsnorm(x, t[p + "input_layernorm.weight"])
        q = rope((h @ t[p + "self_attn.q_proj.weight"].T).reshape(
            T, NH, HD), pos)
        k = rope((h @ t[p + "self_attn.k_proj.weight"].T).reshape(
            T, NH, HD), pos)
        v = (h @ t[p + "self_attn.v_proj.weight"].T).reshape(T, NH, HD)
        logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(HD)
        logits = np.where(mask[None], logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", w, v).reshape(T, NH * HD)
        x = x + o @ t[p + "self_attn.o_proj.weight"].T
        if (i + 1) % 2 != 0:
            h2 = rmsnorm(x, t[p + "post_attention_layernorm.weight"])
            x = x + swiglu(h2, p + "block_sparse_moe.mlp.")
        else:
            rm = swiglu(rmsnorm(x, t[p + "residual_layernorm.weight"]),
                        p + "residual_mlp.")
            h_moe = rmsnorm(residual_input,
                            t[p + "post_attention_layernorm.weight"])
            probs = h_moe @ t[p + "block_sparse_moe.gate.weight"].T
            probs = np.exp(probs - probs.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            moe = np.zeros_like(h_moe)
            for tok in range(T):
                top = np.argsort(-probs[tok])[:TOPK]
                wsum = probs[tok, top].sum()
                for e in top:
                    moe[tok] += (probs[tok, e] / wsum) * swiglu(
                        h_moe[tok:tok + 1],
                        p + f"block_sparse_moe.experts.{e}.")[0]
            x = x + rm + moe
    x = rmsnorm(x, t["model.norm.weight"])
    return x @ t["lm_head.weight"].T


def test_arctic_vs_numpy_golden(tmp_path):
    d = str(tmp_path / "arctic")
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
