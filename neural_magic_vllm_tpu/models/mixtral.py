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
from neural_magic_vllm_tpu.ops.moe import (fused_moe, fused_moe_quant,
                                            topk_softmax)
from neural_magic_vllm_tpu.quantization.wna16 import WNA16LinearMethod


@register_model("MixtralForCausalLM", "QuantMixtralForCausalLM")
class MixtralForCausalLM(LlamaForCausalLM):
    """Also serves QuantMixtralForCausalLM (reference mixtral_quant.py):
    quantized per-expert checkpoints load through the same expert-stacking
    path and execute via fused_moe_quant with weights kept packed."""

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.num_experts = cfg.num_local_experts
        self.top_k = cfg.num_experts_per_tok
        # WNA16-quantized experts stay PACKED in HBM (the mixtral_quant
        # role) — this is what fits W4A16 8x7B checkpoints on-chip
        self.quant_experts = isinstance(self.linear_method,
                                        WNA16LinearMethod)

    def _init_layer(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        for k in ("gate", "up", "down"):
            lp.pop(k, None)
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        scale = 1.0 / np.sqrt(H)
        lp["router"] = rng.uniform(-scale, scale, (H, E)).astype(np.float32)
        if self.quant_experts:
            lm = self.linear_method

            def stack(in_dim, out_dim):
                packed = [lm.create_params(rng, in_dim, out_dim, False)
                          for _ in range(E)]
                return (np.stack([p["qweight"] for p in packed]),
                        np.stack([p["scales"] for p in packed]))

            gq, gs_ = stack(H, I)
            uq, us = stack(H, I)
            dq, ds = stack(I, H)
            lp["experts"] = {"w_gate_q": gq, "w_gate_s": gs_,
                             "w_up_q": uq, "w_up_s": us,
                             "w_down_q": dq, "w_down_s": ds}
            return lp
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
        if self.quant_experts:
            specs["experts"] = {
                "w_gate_q": P(None, None, None, "model"),
                "w_gate_s": P(None, None, None, "model"),
                "w_up_q": P(None, None, None, "model"),
                "w_up_s": P(None, None, None, "model"),
                "w_down_q": P(None, None, "model", None),
                "w_down_s": P(None, None, "model", None),
            }
        else:
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
        if self.quant_experts:
            lm = self.linear_method
            return fused_moe_quant(x, lp["experts"], weights, ids,
                                   bits=lm.bits,
                                   group_size=lm.group_size)
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
            kind = parts[7] if len(parts) > 7 else "weight"
            raw = layer.setdefault("_raw_experts", {})
            if self.quant_experts:
                # mixtral_quant checkpoints: experts.{i}.w1.qweight etc.
                slot = raw.setdefault(wname,
                                      [dict()
                                       for _ in range(self.num_experts)])
                slot[eidx][kind] = w
            else:
                raw.setdefault(wname,
                               [None] * self.num_experts)[eidx] = w
            return True
        return False

    def _finalize_layers(self, layers) -> None:
        super()._finalize_layers(layers)  # attention linears (quant seam)
        lm = self.linear_method
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is None:
                continue
            if self.quant_experts:
                def stack_q(slots):
                    conv = [lm.convert_hf(r) for r in slots]
                    assert all("zeros" not in c for c in conv), \
                        "asymmetric quantized MoE experts not supported"
                    assert all("input_perm" not in c for c in conv), \
                        "act-order quantized MoE experts not supported"
                    return (np.stack([c["qweight"] for c in conv]),
                            np.stack([c["scales"] for c in conv]))

                gq, gs_ = stack_q(raw["w1"])
                uq, us = stack_q(raw["w3"])
                dq, ds = stack_q(raw["w2"])
                layer["experts"] = {"w_gate_q": gq, "w_gate_s": gs_,
                                    "w_up_q": uq, "w_up_s": us,
                                    "w_down_q": dq, "w_down_s": ds}
                continue
            # HF stores [out, in]; stack then transpose to [E, in, out].
            layer["experts"] = {
                "w_gate": np.stack(raw["w1"]).transpose(0, 2, 1).copy(),
                "w_up": np.stack(raw["w3"]).transpose(0, 2, 1).copy(),
                "w_down": np.stack(raw["w2"]).transpose(0, 2, 1).copy(),
            }
