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

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init_params(rng)
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        keys = jax.random.split(rng, self.num_layers)
        for i, lp in enumerate(params["layers"]):
            for k in ("gate", "up", "down"):
                lp.pop(k, None)
            ks = jax.random.split(keys[i], 4)
            scale = 1.0 / np.sqrt(H)
            lp["router"] = (jax.random.uniform(
                ks[0], (H, E), jnp.float32, -scale, scale).astype(self.dtype))
            lp["experts"] = {
                "w_gate": jax.random.uniform(ks[1], (E, H, I), jnp.float32,
                                             -scale, scale).astype(self.dtype),
                "w_up": jax.random.uniform(ks[2], (E, H, I), jnp.float32,
                                           -scale, scale).astype(self.dtype),
                "w_down": jax.random.uniform(ks[3], (E, I, H), jnp.float32,
                                             -scale, scale).astype(self.dtype),
            }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        for lp in specs["layers"]:
            for k in ("gate", "up", "down"):
                lp.pop(k, None)
            lp["router"] = P(None, None)
            lp["experts"] = {
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            }
        return specs

    def _mlp(self, lp, x):
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.top_k)
        return fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                         lp["experts"]["w_down"], weights, ids)

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {
            "layers": [dict() for _ in range(self.num_layers)]
        }
        experts_np: List[Dict[str, list]] = [{
            "w1": [None] * self.num_experts,
            "w2": [None] * self.num_experts,
            "w3": [None] * self.num_experts,
        } for _ in range(self.num_layers)]
        for name, w in iterate_safetensors(model_dir):
            if name == "model.embed_tokens.weight":
                params["embed"] = w
            elif name == "model.norm.weight":
                params["final_norm"] = w
            elif name == "lm_head.weight":
                params["lm_head"] = w.T.copy()
            elif name.startswith("model.layers."):
                parts = name.split(".")
                idx = int(parts[2])
                layer = params["layers"][idx]
                sub = ".".join(parts[3:-1])
                if sub == "input_layernorm":
                    layer["input_norm"] = w
                elif sub == "post_attention_layernorm":
                    layer["post_norm"] = w
                elif sub in self._HF_LINEARS:
                    layer.setdefault(self._HF_LINEARS[sub],
                                     {})["weight"] = w.T.copy()
                elif sub == "block_sparse_moe.gate":
                    layer["router"] = w.T.copy()
                elif "block_sparse_moe.experts" in sub:
                    eidx = int(parts[5])
                    wname = parts[6]  # w1 (gate), w2 (down), w3 (up)
                    experts_np[idx][wname][eidx] = w
        for idx, ex in enumerate(experts_np):
            if ex["w1"][0] is None:
                continue
            layer = params["layers"][idx]
            # HF stores [out, in]; stack then transpose to [E, in, out].
            layer["experts"] = {
                "w_gate": np.stack(ex["w1"]).transpose(0, 2, 1).copy(),
                "w_up": np.stack(ex["w3"]).transpose(0, 2, 1).copy(),
                "w_down": np.stack(ex["w2"]).transpose(0, 2, 1).copy(),
            }
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=self.dtype), params)
