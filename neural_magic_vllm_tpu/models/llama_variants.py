"""Llama-shaped architectures with renamed/fused checkpoint tensors
(reference vllm/model_executor/models/{baichuan,internlm2,aquila,xverse,
orion}.py and the registry aliases in models/__init__.py).

Aquila / Xverse / InternLM(1) use llama tensor names verbatim (InternLM
adds attention biases, which the llama loader already ingests when
present). Baichuan fuses QKV into W_pack; InternLM2 fuses into a
kv-grouped wqkv and renames every module. Orion is llama with LayerNorm —
served by the StableLM knob set (gpt_family.py).
"""
from typing import Any, Dict, List

import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.gpt_family import StableLmForCausalLM
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("AquilaModel", "AquilaForCausalLM", "XverseForCausalLM",
                "InternLMForCausalLM")
class LlamaAliasForCausalLM(LlamaForCausalLM):
    """Pure llama tensor layout under another architecture name."""


@register_model("OrionForCausalLM")
class OrionForCausalLM(StableLmForCausalLM):
    """Orion-14B: llama shape with biased LayerNorm (orion's
    modeling code uses nn.LayerNorm; tensor names match stablelm's map)."""


class _IdentityRope:
    """Positions carried by ALiBi biases instead of rotation."""

    def precompute(self, positions):
        import jax.numpy as jnp
        z = jnp.zeros((positions.shape[0], 1), jnp.float32)
        return z, z

    def apply(self, cos, sin, q, k):
        return q, k


@register_model("BaiChuanForCausalLM", "BaichuanForCausalLM")
class BaichuanForCausalLM(LlamaForCausalLM):
    """Baichuan: llama layout with QKV fused as self_attn.W_pack
    (reference baichuan.py:255). 7B uses rotary positions; 13B
    (hidden 5120 / position_embedding=ALIBI) uses ALiBi per-head biases
    with no rotation (reference baichuan.py:106-126)."""

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        if getattr(self.cfg, "position_embedding", "ROPE").upper() == \
                "ALIBI" or self.cfg.hidden_size == 5120:
            from neural_magic_vllm_tpu.layers.attention import Attention
            from neural_magic_vllm_tpu.ops.attention import get_alibi_slopes
            self.rope = _IdentityRope()
            self.attn = Attention(
                self.num_heads, self.head_dim, self.num_kv_heads,
                scale=self.head_dim**-0.5,
                alibi_slopes=get_alibi_slopes(self.num_heads))

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if ".self_attn.W_pack." in name:
            parts = name.split(".")
            layer = layers[int(parts[2])]
            layer.setdefault("_w_pack", {})[parts[-1]] = w
            return True
        return super()._load_into_layers(layers, name, w, params)

    def _finalize_layers(self, layers: List[Dict]) -> None:
        H = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        for layer in layers:
            raw = layer.pop("_w_pack", None)
            if raw is None:
                continue
            for tgt, sl in (("q", slice(0, H)), ("k", slice(H, H + kv)),
                            ("v", slice(H + kv, H + 2 * kv))):
                layer[tgt] = {
                    k: np.ascontiguousarray(v[sl].T if v.ndim == 2
                                            else v[sl])
                    for k, v in raw.items()
                }
        super()._finalize_layers(layers)


@register_model("DeciLMForCausalLM")
class DeciLMForCausalLM(LlamaForCausalLM):
    """DeciLM: llama with variable GQA (a kv-head count per layer,
    config.num_key_value_heads_per_layer). K/V weights are
    repeat_interleave-degrouped to the max count at load so every layer
    shares one uniform paged-KV shape — identical math, as GQA groups
    that share a kv head keep sharing it (reference decilm.py:52-54,
    _degroup_weight:107-124)."""

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        per_layer = getattr(cfg, "num_key_value_heads_per_layer", None)
        if per_layer:
            cfg.num_key_value_heads = max(per_layer)
        super().__init__(model_config, parallel_config, quant_config)

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if (".self_attn.k_proj." in name or ".self_attn.v_proj." in name) \
                and name.endswith(".weight"):
            hd = self.head_dim
            kvh_l = w.shape[0] // hd
            rep = self.num_kv_heads // kvh_l
            if rep > 1:
                w = np.repeat(w.reshape(kvh_l, hd, -1), rep,
                              axis=0).reshape(self.num_kv_heads * hd, -1)
        return super()._load_into_layers(layers, name, w, params)


@register_model("InternLM2ForCausalLM")
class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2: llama math, renamed modules, kv-grouped fused wqkv
    (reference internlm2.py; rows per kv group = [q*group, k, v])."""

    _RENAMES = {
        "model.tok_embeddings.weight": "model.embed_tokens.weight",
        "output.weight": "lm_head.weight",
    }
    _SUB = {
        "attention.wo": "self_attn.o_proj",
        "feed_forward.w1": "mlp.gate_proj",
        "feed_forward.w3": "mlp.up_proj",
        "feed_forward.w2": "mlp.down_proj",
        "attention_norm": "input_layernorm",
        "ffn_norm": "post_attention_layernorm",
    }

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        name = self._RENAMES.get(name, name)
        if name.startswith("model.layers."):
            parts = name.split(".")
            sub = ".".join(parts[3:-1])
            if sub == "attention.wqkv":
                layers[int(parts[2])].setdefault("_wqkv",
                                                 {})[parts[-1]] = w
                return True
            if sub in self._SUB:
                name = ".".join(parts[:3] + self._SUB[sub].split(".") +
                                [parts[-1]])
        return super()._load_into_layers(layers, name, w, params)

    def _finalize_layers(self, layers: List[Dict]) -> None:
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        qpg = nh // kvh
        for layer in layers:
            raw = layer.pop("_wqkv", None)
            if raw is None:
                continue
            w = raw["weight"].reshape(kvh, qpg + 2, hd, -1)
            H = w.shape[-1]
            layer["q"] = {"weight": np.ascontiguousarray(
                w[:, :qpg].reshape(nh * hd, H).T)}
            layer["k"] = {"weight": np.ascontiguousarray(
                w[:, qpg].reshape(kvh * hd, H).T)}
            layer["v"] = {"weight": np.ascontiguousarray(
                w[:, qpg + 1].reshape(kvh * hd, H).T)}
        super()._finalize_layers(layers)


@register_model("QWenLMHeadModel")
class QWenLMHeadModel(LlamaForCausalLM):
    """Qwen(1): llama math under GPT-2-style names — fused biased c_attn,
    RMSNorm as ln_1/ln_2, MLP halves w2 (gate) / w1 (up) each of
    intermediate_size // 2 (reference qwen.py:44,273-274)."""
    qkv_bias = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        self.intermediate_size = self.cfg.intermediate_size // 2
        self.rms_eps = float(getattr(self.cfg, "layer_norm_epsilon",
                                     self.rms_eps))

    _QWEN_SUB = {
        "attn.c_proj": "self_attn.o_proj",
        "mlp.w2": "mlp.gate_proj",
        "mlp.w1": "mlp.up_proj",
        "mlp.c_proj": "mlp.down_proj",
        "ln_1": "input_layernorm",
        "ln_2": "post_attention_layernorm",
    }

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if name == "transformer.wte.weight":
            name = "model.embed_tokens.weight"
        elif name == "transformer.ln_f.weight":
            name = "model.norm.weight"
        elif name.startswith("transformer.h."):
            parts = name.split(".")
            idx, sub = parts[2], ".".join(parts[3:-1])
            if sub == "attn.c_attn":
                layers[int(idx)].setdefault("_c_attn",
                                            {})[parts[-1]] = w
                return True
            if sub in self._QWEN_SUB:
                name = ".".join(["model", "layers", idx] +
                                self._QWEN_SUB[sub].split(".") +
                                [parts[-1]])
        return super()._load_into_layers(layers, name, w, params)

    def _finalize_layers(self, layers) -> None:
        H = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        for layer in layers:
            raw = layer.pop("_c_attn", None)
            if raw is None:
                continue
            for tgt, sl in (("q", slice(0, H)), ("k", slice(H, H + kv)),
                            ("v", slice(H + kv, H + 2 * kv))):
                layer[tgt] = {
                    k: np.ascontiguousarray(v[sl].T if v.ndim == 2
                                            else v[sl])
                    for k, v in raw.items()
                }
        super()._finalize_layers(layers)
