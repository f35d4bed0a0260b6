"""ChatGLM2/3-style decoder vs an independent numpy full-attention golden
(no HF class for chatglm ships offline): fused biased query_key_value with
MQA groups, partial interleaved rotary over head_dim//2, fused
dense_h_to_4h swiglu."""
import json
import os

import numpy as np

from tests.utils import create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]

NH, KVH, HD, H, I, L, V = 4, 2, 16, 64, 48, 2, 512
EPS = 1e-5


def _make_ckpt(d):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)

    def u(*shape):
        return (rng.uniform(-1, 1, shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {
        "transformer.embedding.word_embeddings.weight": u(V, H),
        "transformer.encoder.final_layernorm.weight":
            np.ones(H, np.float32) + u(H) * 0.1,
        "transformer.output_layer.weight": u(V, H),
        "transformer.rotary_pos_emb.inv_freq": u(HD // 4),
    }
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32) + \
            u(H) * 0.1
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32) + \
            u(H) * 0.1
        t[p + "self_attention.query_key_value.weight"] = u(
            (NH + 2 * KVH) * HD, H)
        t[p + "self_attention.query_key_value.bias"] = u(
            (NH + 2 * KVH) * HD) * 0.1
        t[p + "self_attention.dense.weight"] = u(H, NH * HD)
        t[p + "mlp.dense_h_to_4h.weight"] = u(2 * I, H)
        t[p + "mlp.dense_4h_to_h.weight"] = u(H, I)
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    cfg = {
        "model_type": "chatglm",
        "architectures": ["ChatGLMModel"],
        "num_layers": L, "padded_vocab_size": V, "hidden_size": H,
        "ffn_hidden_size": I, "kv_channels": HD,
        "num_attention_heads": NH, "seq_length": 256,
        "layernorm_epsilon": EPS, "rmsnorm": True,
        "add_bias_linear": False, "add_qkv_bias": True,
        "multi_query_attention": True, "multi_query_group_num": KVH,
        "rope_ratio": 1.0,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(d, vocab_size=V)
    return t


def _np_rope_gptj_half(x, pos):
    """Interleaved pairs over the first HD//2 channels."""
    rd = HD // 2
    inv_freq = 1.0 / (10000.0**(np.arange(0, rd, 2, np.float64) / rd))
    freqs = pos[:, None] * inv_freq[None, :]
    c, s = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    x1, x2 = x_rot[..., 0::2], x_rot[..., 1::2]
    o1, o2 = x1 * c - x2 * s, x2 * c + x1 * s
    rot = np.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    return np.concatenate([rot, x_pass], axis=-1)


def _np_forward(t, ids):
    def rmsnorm(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + EPS) * w

    x = t["transformer.embedding.word_embeddings.weight"][np.asarray(ids)]
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    mask = pos[None, :] <= pos[:, None]
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        h = rmsnorm(x, t[p + "input_layernorm.weight"])
        qkv = h @ t[p + "self_attention.query_key_value.weight"].T + \
            t[p + "self_attention.query_key_value.bias"]
        q = qkv[:, :NH * HD].reshape(T, NH, HD)
        k = qkv[:, NH * HD:(NH + KVH) * HD].reshape(T, KVH, HD)
        v = qkv[:, (NH + KVH) * HD:].reshape(T, KVH, HD)
        q, k = _np_rope_gptj_half(q, pos), _np_rope_gptj_half(k, pos)
        k = np.repeat(k, NH // KVH, axis=1)
        v = np.repeat(v, NH // KVH, axis=1)
        logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(HD)
        logits = np.where(mask[None], logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", w, v).reshape(T, NH * HD)
        x = x + o @ t[p + "self_attention.dense.weight"].T
        h = rmsnorm(x, t[p + "post_attention_layernorm.weight"])
        h4 = h @ t[p + "mlp.dense_h_to_4h.weight"].T
        g, u = h4[:, :I], h4[:, I:]
        x = x + (g / (1 + np.exp(-g)) * u) @ \
            t[p + "mlp.dense_4h_to_h.weight"].T
    x = rmsnorm(x, t["transformer.encoder.final_layernorm.weight"])
    return x @ t["transformer.output_layer.weight"].T


def test_chatglm_vs_numpy_golden(tmp_path):
    d = str(tmp_path / "chatglm")
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
