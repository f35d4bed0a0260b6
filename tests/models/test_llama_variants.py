"""Llama-variant loaders (baichuan W_pack, internlm2 wqkv, aquila/xverse
aliases): a renamed/fused re-export of a tiny llama checkpoint must decode
exactly like the original through the engine."""
import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


from tests.utils import create_tiny_llama_checkpoint, create_tiny_tokenizer

PROMPTS = [[1, 17, 29, 45, 8, 100], [1, 5, 9]]


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("variants") / "llama"
    return create_tiny_llama_checkpoint(str(d), hidden_size=64,
                                        intermediate_size=128,
                                        num_hidden_layers=2,
                                        num_attention_heads=4,
                                        num_key_value_heads=4)


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


def _re_export(src, dst, model_type, architectures, rename_fn):
    from safetensors.numpy import load_file, save_file
    tensors = load_file(os.path.join(src, "model.safetensors"))
    out = {}
    for name, w in tensors.items():
        mapped = rename_fn(name, w, tensors)
        if mapped is None:
            continue
        for new_name, new_w in mapped:
            out[new_name] = np.ascontiguousarray(new_w)
    os.makedirs(dst, exist_ok=True)
    save_file(out, os.path.join(dst, "model.safetensors"))
    with open(os.path.join(src, "config.json")) as f:
        cfg = json.load(f)
    cfg["model_type"] = model_type
    cfg["architectures"] = architectures
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(dst, vocab_size=cfg["vocab_size"])
    return dst


def test_baichuan_w_pack(tiny_llama, tmp_path):
    def rename(name, w, tensors):
        if ".self_attn.q_proj." in name:
            k = tensors[name.replace("q_proj", "k_proj")]
            v = tensors[name.replace("q_proj", "v_proj")]
            return [(name.replace("q_proj", "W_pack"),
                     np.concatenate([w, k, v], axis=0))]
        if ".self_attn.k_proj." in name or ".self_attn.v_proj." in name:
            return []
        return [(name, w)]

    d = _re_export(tiny_llama, str(tmp_path / "baichuan"), "baichuan",
                   ["BaichuanForCausalLM"], rename)
    assert _greedy(d) == _greedy(tiny_llama)


def test_internlm2_wqkv(tiny_llama, tmp_path):
    nh = kvh = 4
    hd = 16

    def rename(name, w, tensors):
        sub_map = {
            "model.embed_tokens.weight": "model.tok_embeddings.weight",
            "lm_head.weight": "output.weight",
        }
        if name in sub_map:
            return [(sub_map[name], w)]
        if ".self_attn.q_proj." in name:
            k = tensors[name.replace("q_proj", "k_proj")]
            v = tensors[name.replace("q_proj", "v_proj")]
            qpg = nh // kvh
            # [kvh, qpg+2, hd, H] grouped interleave
            qg = w.reshape(kvh, qpg, hd, -1)
            kg = k.reshape(kvh, 1, hd, -1)
            vg = v.reshape(kvh, 1, hd, -1)
            fused = np.concatenate([qg, kg, vg], axis=1).reshape(
                kvh * (qpg + 2) * hd, -1)
            return [(name.replace("self_attn.q_proj", "attention.wqkv"),
                     fused)]
        if ".self_attn.k_proj." in name or ".self_attn.v_proj." in name:
            return []
        reps = {
            "self_attn.o_proj": "attention.wo",
            "mlp.gate_proj": "feed_forward.w1",
            "mlp.up_proj": "feed_forward.w3",
            "mlp.down_proj": "feed_forward.w2",
            "input_layernorm": "attention_norm",
            "post_attention_layernorm": "ffn_norm",
        }
        for old, new in reps.items():
            if f".{old}." in name:
                return [(name.replace(old, new), w)]
        return [(name, w)]

    d = _re_export(tiny_llama, str(tmp_path / "internlm2"), "internlm2",
                   ["InternLM2ForCausalLM"], rename)
    assert _greedy(d) == _greedy(tiny_llama)


def test_baichuan_13b_alibi(tiny_llama, tmp_path):
    """Baichuan-13B style: W_pack + ALiBi, no rotary. Golden = an
    independent numpy full-attention forward over the same weights."""
    from safetensors.numpy import load_file

    def rename(name, w, tensors):
        if ".self_attn.q_proj." in name:
            k = tensors[name.replace("q_proj", "k_proj")]
            v = tensors[name.replace("q_proj", "v_proj")]
            return [(name.replace("q_proj", "W_pack"),
                     np.concatenate([w, k, v], axis=0))]
        if ".self_attn.k_proj." in name or ".self_attn.v_proj." in name:
            return []
        return [(name, w)]

    d = _re_export(tiny_llama, str(tmp_path / "baichuan13b"), "baichuan",
                   ["BaichuanForCausalLM"], rename)
    cfg_path = os.path.join(d, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["position_embedding"] = "ALIBI"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    t = load_file(os.path.join(tiny_llama, "model.safetensors"))
    with open(os.path.join(tiny_llama, "config.json")) as f:
        lcfg = json.load(f)
    nh = lcfg["num_attention_heads"]
    hd = lcfg["hidden_size"] // nh
    eps = lcfg.get("rms_norm_eps", 1e-6)

    from neural_magic_vllm_tpu.ops.attention import get_alibi_slopes
    slopes = np.asarray(get_alibi_slopes(nh), np.float32)

    def rmsnorm(x, wname):
        w = t[wname]
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def np_forward(ids):
        x = t["model.embed_tokens.weight"][np.asarray(ids)]
        T = x.shape[0]
        pos = np.arange(T)
        bias = slopes[:, None, None] * (pos[None, None, :] -
                                        pos[None, :, None])
        bias = np.where(pos[None, :] <= pos[:, None], bias[...],
                        -np.inf)
        for i in range(lcfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            h = rmsnorm(x, p + "input_layernorm.weight")
            q = (h @ t[p + "self_attn.q_proj.weight"].T).reshape(T, nh, hd)
            k = (h @ t[p + "self_attn.k_proj.weight"].T).reshape(T, nh, hd)
            v = (h @ t[p + "self_attn.v_proj.weight"].T).reshape(T, nh, hd)
            logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd) + bias
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", w, v).reshape(T, -1)
            x = x + o @ t[p + "self_attn.o_proj.weight"].T
            h = rmsnorm(x, p + "post_attention_layernorm.weight")
            g = h @ t[p + "mlp.gate_proj.weight"].T
            u = h @ t[p + "mlp.up_proj.weight"].T
            x = x + (g / (1 + np.exp(-g)) * u) @ t[p +
                                                   "mlp.down_proj.weight"].T
        x = rmsnorm(x, "model.norm.weight")
        return x @ t["lm_head.weight"].T

    gen = _greedy(d)
    for prompt, toks in zip(PROMPTS, gen):
        seq = list(prompt)
        for tok in toks:
            logits = np_forward(seq)[-1]
            top = int(np.argmax(logits))
            assert tok == top or \
                abs(logits[tok] - logits[top]) < 2e-3, (seq, tok, top)
            seq.append(tok)


def test_qwen1_gpt2_names(tiny_llama, tmp_path):
    """Qwen(1): fused biased c_attn under transformer.h.* names; mlp.w2 is
    the gate half, mlp.w1 the up half (reference qwen.py:44,273-274)."""
    def rename(name, w, tensors):
        sub_map = {
            "model.embed_tokens.weight": "transformer.wte.weight",
            "model.norm.weight": "transformer.ln_f.weight",
            "lm_head.weight": "lm_head.weight",
        }
        if name in sub_map:
            return [(sub_map[name], w)]
        if ".self_attn.q_proj." in name:
            k = tensors[name.replace("q_proj", "k_proj")]
            v = tensors[name.replace("q_proj", "v_proj")]
            fused = np.concatenate([w, k, v], axis=0)
            base = name.replace("model.layers.", "transformer.h.").replace(
                "self_attn.q_proj.weight", "attn.c_attn")
            return [(base + ".weight", fused),
                    (base + ".bias",
                     np.zeros(fused.shape[0], dtype=fused.dtype))]
        if ".self_attn.k_proj." in name or ".self_attn.v_proj." in name:
            return []
        reps = {
            "self_attn.o_proj": "attn.c_proj",
            "mlp.gate_proj": "mlp.w2",
            "mlp.up_proj": "mlp.w1",
            "mlp.down_proj": "mlp.c_proj",
            "input_layernorm": "ln_1",
            "post_attention_layernorm": "ln_2",
        }
        for old, new in reps.items():
            if f".{old}." in name:
                return [(name.replace("model.layers.",
                                      "transformer.h.").replace(old, new),
                         w)]
        return [(name, w)]

    d = _re_export(tiny_llama, str(tmp_path / "qwen"), "qwen",
                   ["QWenLMHeadModel"], rename)
    # Qwen configs report intermediate_size as 2x the per-half width.
    cfg_path = os.path.join(d, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["intermediate_size"] = cfg["intermediate_size"] * 2
    cfg["layer_norm_epsilon"] = cfg.pop("rms_norm_eps")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert _greedy(d) == _greedy(tiny_llama)


def test_decilm_variable_gqa(tiny_llama, tmp_path):
    """DeciLM per-layer GQA: a checkpoint whose layer 0 stores 2 kv heads
    and layer 1 stores 4 must decode exactly like the uniform-4-head llama
    checkpoint whose layer-0 kv heads are those 2 repeated."""
    from safetensors.numpy import load_file, save_file
    hd = 16

    # uniform llama golden: layer-0 k/v heads = first two heads tiled 2x
    src = load_file(os.path.join(tiny_llama, "model.safetensors"))
    golden = dict(src)
    grouped = {}
    for which in ("k_proj", "v_proj"):
        name = f"model.layers.0.self_attn.{which}.weight"
        w = src[name]
        base = w.reshape(4, hd, -1)[:2]  # 2 distinct kv heads
        grouped[name] = base.reshape(2 * hd, -1)
        golden[name] = np.repeat(base, 2, axis=0).reshape(4 * hd, -1)
    gdir = str(tmp_path / "llama-degrouped")
    os.makedirs(gdir, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in golden.items()},
              os.path.join(gdir, "model.safetensors"))
    for fn in ("config.json", ):
        with open(os.path.join(tiny_llama, fn)) as f:
            cfg = json.load(f)
        with open(os.path.join(gdir, fn), "w") as f:
            json.dump(cfg, f)
    create_tiny_tokenizer(gdir, vocab_size=cfg["vocab_size"])

    # decilm checkpoint: layer 0 grouped (2 heads), layer 1 as-is (4)
    deci = dict(src)
    deci.update(grouped)
    ddir = str(tmp_path / "decilm")
    os.makedirs(ddir, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in deci.items()},
              os.path.join(ddir, "model.safetensors"))
    cfg = dict(cfg)
    cfg["model_type"] = "deci"
    cfg["architectures"] = ["DeciLMForCausalLM"]
    cfg["num_key_value_heads_per_layer"] = [2, 4]
    cfg.pop("num_key_value_heads", None)
    with open(os.path.join(ddir, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(ddir, vocab_size=cfg["vocab_size"])

    assert _greedy(ddir) == _greedy(gdir)


def test_minicpm_scalings(tiny_llama, tmp_path):
    """MiniCPM muP scalings are exact linear folds: engine(minicpm with
    scale_emb/scale_depth/dim_model_base) == engine(llama with embed,
    o_proj+down_proj, lm_head pre-scaled accordingly)."""
    from safetensors.numpy import load_file, save_file
    with open(os.path.join(tiny_llama, "config.json")) as f:
        base_cfg = json.load(f)
    L, H = base_cfg["num_hidden_layers"], base_cfg["hidden_size"]
    scale_emb, scale_depth, dmb = 2.0, 1.4, H // 2
    m = scale_depth / np.sqrt(L)
    logit_scale = dmb / H

    src = load_file(os.path.join(tiny_llama, "model.safetensors"))

    # minicpm checkpoint: same tensors, scaling via config
    mdir = str(tmp_path / "minicpm")
    os.makedirs(mdir, exist_ok=True)
    save_file(dict(src), os.path.join(mdir, "model.safetensors"))
    cfg = dict(base_cfg, model_type="minicpm",
               architectures=["MiniCPMForCausalLM"], scale_emb=scale_emb,
               scale_depth=scale_depth, dim_model_base=dmb,
               tie_word_embeddings=False)
    with open(os.path.join(mdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    create_tiny_tokenizer(mdir, vocab_size=cfg["vocab_size"])

    # folded llama golden
    folded = {}
    for name, w in src.items():
        if name == "model.embed_tokens.weight":
            w = w * scale_emb
        elif name == "lm_head.weight":
            w = w * logit_scale
        elif ".self_attn.o_proj." in name or ".mlp.down_proj." in name:
            w = w * m
        folded[name] = np.ascontiguousarray(w.astype(np.float32))
    gdir = str(tmp_path / "llama-folded")
    os.makedirs(gdir, exist_ok=True)
    save_file(folded, os.path.join(gdir, "model.safetensors"))
    with open(os.path.join(gdir, "config.json"), "w") as f:
        json.dump(base_cfg, f)
    create_tiny_tokenizer(gdir, vocab_size=base_cfg["vocab_size"])

    assert _greedy(mdir) == _greedy(gdir)


def test_minicpm_moe(tmp_path):
    """MiniCPM-MoE loader: a tiny mixtral re-exported under minicpm expert
    names (mlp.gate, mlp.experts.N.w{1,2,3}) with neutral scalings decodes
    exactly like the mixtral original (same renormalized top-k routing)."""
    from tests.utils import create_tiny_mixtral_checkpoint
    src_dir = create_tiny_mixtral_checkpoint(str(tmp_path / "mixtral"))

    def rename(name, w, tensors):
        name = name.replace("block_sparse_moe.gate", "mlp.gate")
        name = name.replace("block_sparse_moe.experts", "mlp.experts")
        return [(name, w)]

    d = _re_export(src_dir, str(tmp_path / "minicpm_moe"), "minicpm",
                   ["MiniCPMForCausalLM"], rename)
    cfg_path = os.path.join(d, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["num_experts"] = cfg.pop("num_local_experts")
    cfg.update(scale_emb=1.0,
               scale_depth=float(np.sqrt(cfg["num_hidden_layers"])),
               dim_model_base=cfg["hidden_size"], tie_word_embeddings=False)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert _greedy(d) == _greedy(src_dir)


def test_aquila_alias(tiny_llama, tmp_path):
    d = _re_export(tiny_llama, str(tmp_path / "aquila"), "aquila",
                   ["AquilaForCausalLM"], lambda n, w, t: [(n, w)])
    assert _greedy(d) == _greedy(tiny_llama)
