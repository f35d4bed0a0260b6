"""Llama-variant loaders (baichuan W_pack, internlm2 wqkv, aquila/xverse
aliases): a renamed/fused re-export of a tiny llama checkpoint must decode
exactly like the original through the engine."""
import json
import os

import numpy as np
import pytest

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


def test_aquila_alias(tiny_llama, tmp_path):
    d = _re_export(tiny_llama, str(tmp_path / "aquila"), "aquila",
                   ["AquilaForCausalLM"], lambda n, w, t: [(n, w)])
    assert _greedy(d) == _greedy(tiny_llama)
