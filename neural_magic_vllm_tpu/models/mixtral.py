"""Mixtral MoE decoder (reference vllm/model_executor/models/mixtral.py):
Llama attention + top-2 routed expert MLPs. Expert weights are stacked
[E, H, I] / [E, I, H] and TP-sharded on the intermediate axis (the
reference's w13-column / w2-row sharding, fused_moe/layer.py:77)."""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.norm import fused_add_rms_norm, rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
from neural_magic_vllm_tpu.ops.kv_cache import KVCache
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("MixtralForCausalLM")
class MixtralForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.num_experts = cfg.num_local_experts
        self.top_k = cfg.num_experts_per_tok

    def _init_layer(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
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
        for k in ("gate", "up", "down"):
            specs.pop(k, None)
        specs["router"] = P(None, None)
        # Experts TP-sharded on the intermediate axis (reference w13-column /
        # w2-row sharding, fused_moe/layer.py:77).
        specs["experts"] = {
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        }
        return specs

    def _mlp(self, lp, x, lora_ctx=None):
        # (experts are not LoRA targets, matching the reference)
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.top_k)
        return fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                         lp["experts"]["w_down"], weights, ids)

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        sub = ".".join(parts[3:-1])
        layer = layers[idx]
        if sub == "block_sparse_moe.gate":
            layer["router"] = w.T.copy()
            return True
        if "block_sparse_moe.experts" in name:
            eidx = int(parts[5])
            wname = parts[6]  # w1 (gate), w2 (down), w3 (up)
            raw = layer.setdefault("_raw_experts", {})
            raw.setdefault(wname, [None] * self.num_experts)[eidx] = w
            return True
        return False

    def _finalize_layers(self, layers) -> None:
        super()._finalize_layers(layers)  # attention linears (quant seam)
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is None:
                continue
            # HF stores [out, in]; stack then transpose to [E, in, out].
            layer["experts"] = {
                "w_gate": np.stack(raw["w1"]).transpose(0, 2, 1).copy(),
                "w_up": np.stack(raw["w3"]).transpose(0, 2, 1).copy(),
                "w_down": np.stack(raw["w2"]).transpose(0, 2, 1).copy(),
            }
