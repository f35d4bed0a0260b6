"""MiniCPM (reference vllm/model_executor/models/minicpm.py): llama math
with muP-style scalings — embeddings x scale_emb (minicpm.py:365), each
residual branch x scale_depth/sqrt(L) (minicpm.py:323-331), logits divided
by hidden_size/dim_model_base (minicpm.py:454,473) — and an optional
all-layer MoE MLP with renormalized top-k routing (MiniCPMMoE,
minicpm.py:56-145; experts named mlp.experts.N.w{1,2,3})."""
import math
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("MiniCPMForCausalLM")
class MiniCPMForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.emb_scale = float(getattr(cfg, "scale_emb", 1.0))
        self.residual_scale = float(
            getattr(cfg, "scale_depth", math.sqrt(self.num_layers))
        ) / math.sqrt(self.num_layers)
        self.logit_scale = float(getattr(cfg, "dim_model_base",
                                         self.hidden_size)) / self.hidden_size
        self.num_experts = int(getattr(cfg, "num_experts", 0) or 0)
        self.top_k = int(getattr(cfg, "num_experts_per_tok", 0) or 0)

    # --- params -------------------------------------------------------------
    def _init_layer(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        if not self.num_experts:
            return lp
        for k in ("gate", "up", "down"):
            lp.pop(k, None)
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        scale = 1.0 / np.sqrt(H)
        lp["router"] = rng.uniform(-scale, scale, (H, E)).astype(np.float32)
        lp["experts"] = {
            "w_gate": rng.uniform(-scale, scale,
                                  (E, H, I)).astype(np.float32),
            "w_up": rng.uniform(-scale, scale, (E, H, I)).astype(np.float32),
            "w_down": rng.uniform(-scale, scale,
                                  (E, I, H)).astype(np.float32),
        }
        return lp

    def _layer_specs(self) -> Dict[str, Any]:
        specs = super()._layer_specs()
        if not self.num_experts:
            return specs
        for k in ("gate", "up", "down"):
            specs.pop(k, None)
        specs["router"] = P(None, None)
        specs["experts"] = {
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        }
        return specs

    # --- loading ------------------------------------------------------------
    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if self.num_experts and name.startswith("model.layers."):
            parts = name.split(".")
            sub = ".".join(parts[3:-1])
            layer = layers[int(parts[2])]
            if sub == "mlp.gate":
                layer["router"] = w.T.copy()
                return True
            if parts[3] == "mlp" and parts[4] == "experts":
                eidx, wname = int(parts[5]), parts[6]
                raw = layer.setdefault("_raw_experts", {})
                raw.setdefault(wname, {})[eidx] = w
                return True
        return super()._load_into_layers(layers, name, w, params)

    def _finalize_layers(self, layers) -> None:
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is None:
                continue
            E = self.num_experts

            def stack(wname, transpose):
                ws = [raw[wname][e] for e in range(E)]
                return np.stack([np.ascontiguousarray(w.T) if transpose
                                 else w for w in ws])

            layer["experts"] = {
                "w_gate": stack("w1", True),  # [E, H, I]
                "w_up": stack("w3", True),
                "w_down": stack("w2", True),  # [I, H] -> stored [E, I, H]
            }
        super()._finalize_layers(layers)

    # --- forward ------------------------------------------------------------
    def embed_tokens(self, params, token_ids):
        x = super().embed_tokens(params, token_ids)
        return x * jnp.asarray(self.emb_scale, x.dtype)

    def _mlp(self, lp, x, lora_ctx=None):
        if not self.num_experts:
            return super()._mlp(lp, x, lora_ctx)
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.top_k,
                                    renormalize=True)
        return fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                         lp["experts"]["w_down"], weights, ids)

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, lora_ctx=None, layer_id=None):
        from neural_magic_vllm_tpu.layers.norm import rms_norm
        m = jnp.asarray(self.residual_scale, res.dtype)
        T = res.shape[0]
        normed = rms_norm(res, lp["input_norm"], self.rms_eps)
        q = self._linear(lp, "q", normed,
                         lora_ctx).reshape(T, self.num_heads, self.head_dim)
        k = self._linear(lp, "k", normed, lora_ctx).reshape(
            T, self.num_kv_heads, self.head_dim)
        v = self._linear(lp, "v", normed, lora_ctx).reshape(
            T, self.num_kv_heads, self.head_dim)
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb,
                                        kv_scales=lp.get("kv_scales"))
        attn_out = self._linear(
            lp, "o", attn_out.reshape(T, self.num_heads * self.head_dim),
            lora_ctx)
        res = res + attn_out * m
        normed2 = rms_norm(res, lp["post_norm"], self.rms_eps)
        res = res + self._mlp(lp, normed2, lora_ctx) * m
        return res, new_cache

    def compute_logits(self, params, hidden):
        return super().compute_logits(
            params, hidden) * jnp.asarray(self.logit_scale, jnp.float32)
