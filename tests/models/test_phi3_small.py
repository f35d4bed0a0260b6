"""Phi-3-Small vs an independent numpy golden: head-major fused qkv,
gegelu-with-limit MLP, muP scalings, dummy-token logit masking, and
alternating blocksparse/dense attention (dense_attention_every_n_layers=2,
heterogeneous vertical-stride head patterns)."""
import json
import os

import numpy as np

from tests.utils import create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100, 7, 42, 3, 66], [1, 5, 9]]

NH, KVH, HD, H, I, L, V = 4, 2, 16, 64, 48, 2, 512
EPS = 1e-5
BS_BLOCK, BS_LOCAL, BS_VERT = 4, 1, 2
EMB_MULT, ATTN_MULT, WIDTH_MULT = 1.5, 2.0, 2.0
GEGELU_LIMIT = 8.0
DUMMY = [V - 1, V - 2]


def _make_ckpt(d):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(3)

    def u(*shape):
        return (rng.uniform(-1, 1, shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {"model.embed_tokens.weight": u(V, H)}
    t["model.final_layernorm.weight"] = np.ones(H, np.float32) + u(H) * 0.1
    t["model.final_layernorm.bias"] = u(H) * 0.1
    qpg = NH // KVH
    for i in range(L):
        p = f"model.layers.{i}."
        for key in ("input_layernorm", "post_attention_layernorm"):
            t[p + key + ".weight"] = np.ones(H, np.float32) + u(H) * 0.1
            t[p + key + ".bias"] = u(H) * 0.1
        t[p + "self_attn.query_key_value.weight"] = u(
            KVH * (qpg + 2) * HD, H)
        t[p + "self_attn.query_key_value.bias"] = u(
            KVH * (qpg + 2) * HD) * 0.1
        t[p + "self_attn.dense.weight"] = u(H, NH * HD)
        t[p + "self_attn.dense.bias"] = u(H) * 0.1
        t[p + "mlp.up_proj.weight"] = u(2 * I, H)
        t[p + "mlp.up_proj.bias"] = u(2 * I) * 0.1
        t[p + "mlp.down_proj.weight"] = u(H, I)
        t[p + "mlp.down_proj.bias"] = u(H) * 0.1
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "phi3small",
        "architectures": ["Phi3SmallForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": KVH, "max_position_embeddings": 256,
        "layer_norm_epsilon": EPS, "hidden_act": "gegelu",
        "gegelu_limit": GEGELU_LIMIT,
        "rope_embedding_base": 10000.0, "rope_position_scale": 1.0,
        "mup_use_scaling": True, "mup_attn_multiplier": ATTN_MULT,
        "mup_embedding_multiplier": EMB_MULT,
        "mup_width_multiplier": WIDTH_MULT,
        "dummy_token_indices": DUMMY,
        "blocksparse_block_size": BS_BLOCK,
        "blocksparse_triton_kernel_block_size": BS_BLOCK,
        "blocksparse_num_local_blocks": BS_LOCAL,
        "blocksparse_vert_stride": BS_VERT,
        "blocksparse_homo_head_pattern": False,
        "dense_attention_every_n_layers": 2,
        "tie_word_embeddings": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return t


def _np_forward(t, ids):
    qpg = NH // KVH

    def ln(x, p):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean)**2).mean(-1, keepdims=True)
        return (x - mean) / np.sqrt(var + EPS) * t[p + ".weight"] + \
            t[p + ".bias"]

    def rope(x, pos):
        inv_freq = 1.0 / (10000.0**(np.arange(0, HD, 2, np.float64) / HD))
        freqs = pos[:, None] * inv_freq[None, :]
        c, s = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
        x1, x2 = x[..., :HD // 2], x[..., HD // 2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)

    x = t["model.embed_tokens.weight"][np.asarray(ids)] * EMB_MULT
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    causal = pos[None, :] <= pos[:, None]
    step = max(1, BS_VERT // NH)
    qb, kb = (np.arange(T) // BS_BLOCK), (np.arange(T) // BS_BLOCK)
    sparse_allow = np.zeros((NH, T, T), bool)
    for h in range(NH):
        local = (qb[:, None] - kb[None, :]) < BS_LOCAL
        vert = (kb[None, :] + h * step + 1) % BS_VERT == 0
        sparse_allow[h] = causal & (local | np.broadcast_to(vert, (T, T)))
    dense_allow = np.broadcast_to(causal, (NH, T, T))

    for i in range(L):
        p = f"model.layers.{i}."
        h_in = ln(x, p + "input_layernorm")
        qkv = h_in @ t[p + "self_attn.query_key_value.weight"].T + \
            t[p + "self_attn.query_key_value.bias"]
        g = qkv.reshape(T, KVH, qpg + 2, HD)
        q = g[:, :, :qpg].reshape(T, NH, HD)
        k = g[:, :, qpg].reshape(T, KVH, HD)
        v = g[:, :, qpg + 1].reshape(T, KVH, HD)
        q, k = rope(q, pos), rope(k, pos)
        k = np.repeat(k, qpg, axis=1)
        v = np.repeat(v, qpg, axis=1)
        logits = np.einsum("qhd,khd->hqk", q, k) * (ATTN_MULT / HD)
        allow = dense_allow if (i + 1) % 2 == 0 else sparse_allow
        logits = np.where(allow, logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", w, v).reshape(T, NH * HD)
        x = x + o @ t[p + "self_attn.dense.weight"].T + \
            t[p + "self_attn.dense.bias"]
        h2 = ln(x, p + "post_attention_layernorm")
        up = h2 @ t[p + "mlp.up_proj.weight"].T + t[p + "mlp.up_proj.bias"]
        a, b = up[..., 0::2], up[..., 1::2]
        a = np.minimum(a, GEGELU_LIMIT)
        b = np.clip(b, -GEGELU_LIMIT, GEGELU_LIMIT)
        act = a / (1 + np.exp(-1.702 * a)) * (b + 1.0)
        x = x + act @ t[p + "mlp.down_proj.weight"].T + \
            t[p + "mlp.down_proj.bias"]
    x = ln(x, "model.final_layernorm")
    logits = (x @ t["model.embed_tokens.weight"].T) / WIDTH_MULT
    logits[:, DUMMY] = -np.inf
    return logits


def test_phi3_small_vs_numpy_golden(tmp_path):
    d = str(tmp_path / "phi3small")
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
