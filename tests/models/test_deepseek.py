"""DeepSeek (v1) MoE: (a) a tiny mixtral re-exported under deepseek expert
names must decode identically (same renormalized top-k routing math);
(b) first_k_dense_replace + shared experts vs an independent numpy golden."""
import json
import os

import numpy as np

from tests.utils import create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]


def _greedy(model_dir):
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate(prompt_token_ids=PROMPTS, sampling_params=sp,
                        use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_deepseek_moe_from_mixtral(tmp_path):
    from safetensors.numpy import load_file, save_file
    from tests.utils import create_tiny_mixtral_checkpoint
    src_dir = create_tiny_mixtral_checkpoint(str(tmp_path / "mixtral"))
    src = load_file(os.path.join(src_dir, "model.safetensors"))
    out = {}
    for name, w in src.items():
        name = name.replace("block_sparse_moe.gate", "mlp.gate")
        if "block_sparse_moe.experts" in name:
            name = name.replace("block_sparse_moe.experts", "mlp.experts")
            name = name.replace(".w1.", ".gate_proj.")
            name = name.replace(".w3.", ".up_proj.")
            name = name.replace(".w2.", ".down_proj.")
        out[name] = w
    d = str(tmp_path / "deepseek")
    os.makedirs(d, exist_ok=True)
    save_file(out, os.path.join(d, "model.safetensors"))
    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg.update(model_type="deepseek", architectures=["DeepseekForCausalLM"],
               n_routed_experts=cfg.pop("num_local_experts"),
               moe_intermediate_size=cfg["intermediate_size"],
               n_shared_experts=None, first_k_dense_replace=0,
               moe_layer_freq=1, norm_topk_prob=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=cfg["vocab_size"])
    assert _greedy(d) == _greedy(src_dir)


NH, HD, H, L, V = 4, 16, 64, 2, 512
I_DENSE, I_MOE, E, TOPK, SHARED = 96, 48, 4, 2, 1
EPS = 1e-6


def _make_ds_ckpt(d):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(7)

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
        if i == 0:  # dense layer
            t[p + "mlp.gate_proj.weight"] = u(I_DENSE, H)
            t[p + "mlp.up_proj.weight"] = u(I_DENSE, H)
            t[p + "mlp.down_proj.weight"] = u(H, I_DENSE)
        else:
            t[p + "mlp.gate.weight"] = u(E, H)
            for e in range(E):
                t[p + f"mlp.experts.{e}.gate_proj.weight"] = u(I_MOE, H)
                t[p + f"mlp.experts.{e}.up_proj.weight"] = u(I_MOE, H)
                t[p + f"mlp.experts.{e}.down_proj.weight"] = u(H, I_MOE)
            S = I_MOE * SHARED
            t[p + "mlp.shared_experts.gate_proj.weight"] = u(S, H)
            t[p + "mlp.shared_experts.up_proj.weight"] = u(S, H)
            t[p + "mlp.shared_experts.down_proj.weight"] = u(H, S)
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "deepseek", "architectures": ["DeepseekForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I_DENSE,
        "moe_intermediate_size": I_MOE, "num_hidden_layers": L,
        "num_attention_heads": NH, "num_key_value_heads": NH,
        "n_routed_experts": E, "n_shared_experts": SHARED,
        "num_experts_per_tok": TOPK, "first_k_dense_replace": 1,
        "moe_layer_freq": 1, "norm_topk_prob": False,
        "max_position_embeddings": 256, "rms_norm_eps": EPS,
        "rope_theta": 10000.0, "tie_word_embeddings": False,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return t


def _np_rope_neox(x, pos):
    inv_freq = 1.0 / (10000.0**(np.arange(0, HD, 2, np.float64) / HD))
    freqs = pos[:, None] * inv_freq[None, :]
    c, s = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
    x1, x2 = x[..., :HD // 2], x[..., HD // 2:]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _np_forward(t, ids):
    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + EPS) * w

    def swiglu(h, p):
        g = h @ t[p + "gate_proj.weight"].T
        u = h @ t[p + "up_proj.weight"].T
        return (g / (1 + np.exp(-g)) * u) @ t[p + "down_proj.weight"].T

    x = t["model.embed_tokens.weight"][np.asarray(ids)]
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    mask = pos[None, :] <= pos[:, None]
    for i in range(L):
        p = f"model.layers.{i}."
        h = rmsnorm(x, t[p + "input_layernorm.weight"])
        q = _np_rope_neox(
            (h @ t[p + "self_attn.q_proj.weight"].T).reshape(T, NH, HD),
            pos)
        k = _np_rope_neox(
            (h @ t[p + "self_attn.k_proj.weight"].T).reshape(T, NH, HD),
            pos)
        v = (h @ t[p + "self_attn.v_proj.weight"].T).reshape(T, NH, HD)
        logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(HD)
        logits = np.where(mask[None], logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", w, v).reshape(T, NH * HD)
        x = x + o @ t[p + "self_attn.o_proj.weight"].T
        h2 = rmsnorm(x, t[p + "post_attention_layernorm.weight"])
        if i == 0:
            x = x + swiglu(h2, p + "mlp.")
        else:
            probs = h2 @ t[p + "mlp.gate.weight"].T
            probs = np.exp(probs - probs.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            moe = np.zeros_like(h2)
            for tok in range(T):
                top = np.argsort(-probs[tok])[:TOPK]
                for e in top:
                    moe[tok] += probs[tok, e] * swiglu(
                        h2[tok:tok + 1], p + f"mlp.experts.{e}.")[0]
            moe += swiglu(h2, p + "mlp.shared_experts.")
            x = x + moe
    x = rmsnorm(x, t["model.norm.weight"])
    return x @ t["lm_head.weight"].T


def test_deepseek_first_dense_shared_vs_numpy(tmp_path):
    d = str(tmp_path / "ds1")
    t = _make_ds_ckpt(d)
    gen = _greedy(d)
    for prompt, toks in zip(PROMPTS, gen):
        seq = list(prompt)
        for tok in toks:
            logits = _np_forward(t, seq)[-1]
            top = int(np.argmax(logits))
            assert tok == top or \
                abs(logits[tok] - logits[top]) < 2e-3, (seq, tok, top)
            seq.append(tok)
