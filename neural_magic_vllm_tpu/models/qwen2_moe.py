"""Qwen2-MoE decoder (reference vllm/model_executor/models/qwen2_moe.py):
Qwen2 attention (qkv bias) + top-k routed experts + a shared expert whose
output is gated by sigmoid(shared_expert_gate(x))."""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("Qwen2MoeForCausalLM")
class Qwen2MoeForCausalLM(LlamaForCausalLM):
    qkv_bias = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.num_experts = cfg.num_experts
        self.top_k = cfg.num_experts_per_tok
        self.moe_intermediate = cfg.moe_intermediate_size
        self.shared_intermediate = getattr(
            cfg, "shared_expert_intermediate_size", 0)
        self.norm_topk_prob = bool(getattr(cfg, "norm_topk_prob", False))
        if getattr(cfg, "mlp_only_layers", None):
            raise NotImplementedError(
                "qwen2_moe mlp_only_layers not supported yet")

    def _init_layer(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        for k in ("gate", "up", "down"):
            lp.pop(k, None)
        H, I, E = self.hidden_size, self.moe_intermediate, self.num_experts
        scale = 1.0 / np.sqrt(H)
        lp["router"] = rng.uniform(-scale, scale, (H, E)).astype(np.float32)
        lp["experts"] = {
            "w_gate": rng.uniform(-scale, scale,
                                  (E, H, I)).astype(np.float32),
            "w_up": rng.uniform(-scale, scale, (E, H, I)).astype(np.float32),
            "w_down": rng.uniform(-scale, scale,
                                  (E, I, H)).astype(np.float32),
        }
        S = self.shared_intermediate
        if S:
            lp["shared"] = {
                "gate": {"weight": rng.uniform(-scale, scale,
                                               (H, S)).astype(np.float32)},
                "up": {"weight": rng.uniform(-scale, scale,
                                             (H, S)).astype(np.float32)},
                "down": {"weight": rng.uniform(-scale, scale,
                                               (S, H)).astype(np.float32)},
            }
            lp["shared_gate"] = rng.uniform(-scale, scale,
                                            (H, 1)).astype(np.float32)
        return lp

    def _layer_specs(self) -> Dict[str, Any]:
        specs = super()._layer_specs()
        for k in ("gate", "up", "down"):
            specs.pop(k, None)
        specs["router"] = P(None, None)
        specs["experts"] = {
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        }
        if self.shared_intermediate:
            specs["shared"] = {
                "gate": {"weight": P(None, "model")},
                "up": {"weight": P(None, "model")},
                "down": {"weight": P("model", None)},
            }
            specs["shared_gate"] = P(None, None)
        return specs

    def _mlp(self, lp, x, lora_ctx=None):
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.top_k,
                                    renormalize=self.norm_topk_prob)
        out = fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                        lp["experts"]["w_down"], weights, ids)
        if self.shared_intermediate:
            lm = self.linear_method
            sh = lp["shared"]
            shared = lm.apply(sh["down"], silu_and_mul(
                lm.apply(sh["gate"], x), lm.apply(sh["up"], x)))
            g = jnp.dot(x, lp["shared_gate"],
                        preferred_element_type=jnp.float32)
            out = out + shared * jax.nn.sigmoid(g).astype(out.dtype)
        return out

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        layer = layers[idx]
        sub = ".".join(parts[3:-1])
        if sub == "mlp.gate":
            layer["router"] = w.T.copy()
            return True
        if sub == "mlp.shared_expert_gate":
            layer["shared_gate"] = w.T.copy()
            return True
        if ".mlp.experts." in name:
            eidx = int(parts[5])
            proj = parts[6]  # gate_proj | up_proj | down_proj
            raw = layer.setdefault("_raw_experts", {})
            raw.setdefault(proj, [None] * self.num_experts)[eidx] = w
            return True
        if ".mlp.shared_expert." in name:
            proj = parts[5]
            key = {"gate_proj": "gate", "up_proj": "up",
                   "down_proj": "down"}[proj]
            layer.setdefault("shared", {})[key] = {"weight": w.T.copy()}
            return True
        return False

    def _finalize_layers(self, layers) -> None:
        super()._finalize_layers(layers)
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is None:
                continue
            layer["experts"] = {
                "w_gate": np.stack(raw["gate_proj"]).transpose(0, 2,
                                                               1).copy(),
                "w_up": np.stack(raw["up_proj"]).transpose(0, 2, 1).copy(),
                "w_down": np.stack(raw["down_proj"]).transpose(0, 2,
                                                               1).copy(),
            }
