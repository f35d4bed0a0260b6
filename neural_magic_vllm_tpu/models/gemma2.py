"""Gemma2 decoder (reference vllm/model_executor/models/gemma2.py):
Gemma's GeGLU/(1+w)-norm/scaled-embedding conventions plus
- sandwich norms: post-attention and post-feedforward norms applied to the
  SUBLAYER OUTPUT before the residual add (4 norms per layer)
- attention logit soft-capping and final logit soft-capping
- alternating sliding-window / global attention per layer (handled as a
  traced per-layer window through the lax.scan body — the scan still traces
  ONE layer)
- query scale from query_pre_attn_scalar.
"""
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.gemma import GemmaForCausalLM


@register_model("Gemma2ForCausalLM")
class Gemma2ForCausalLM(GemmaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.attn_logit_cap = getattr(cfg, "attn_logit_softcapping", None)
        self.final_logit_cap = getattr(cfg, "final_logit_softcapping", None)
        self.attn.logit_cap = self.attn_logit_cap
        qpas = getattr(cfg, "query_pre_attn_scalar", None)
        if qpas:
            self.attn.scale = float(qpas)**-0.5
        # even layers sliding, odd global (HF Gemma2 convention)
        self.window_size = getattr(cfg, "sliding_window", 4096) or 4096
        self.attn.sliding_window = None  # per-layer window passed traced

    def _init_layer(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        H = self.hidden_size
        lp["pre_ff_norm"] = np.ones((H, ), np.float32)
        lp["post_ff_norm"] = np.ones((H, ), np.float32)
        return lp

    def _layer_specs(self) -> Dict[str, Any]:
        specs = super()._layer_specs()
        specs["pre_ff_norm"] = P(None)
        specs["post_ff_norm"] = P(None)
        return specs

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        sub = ".".join(parts[3:-1])
        if sub == "pre_feedforward_layernorm":
            layers[idx]["pre_ff_norm"] = w
            return True
        if sub == "post_feedforward_layernorm":
            layers[idx]["post_ff_norm"] = w
            return True
        return False

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, lora_ctx=None, layer_id=None):
        off = self.norm_weight_offset
        T = res.shape[0]
        # traced per-layer window: even layers sliding, odd global
        window = jnp.where(layer_id % 2 == 0, self.window_size,
                           jnp.int32(2**30))
        normed = rms_norm(res, lp["input_norm"], self.rms_eps, off)
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
                                        window=window)
        attn_out = self._linear(
            lp, "o", attn_out.reshape(T, self.num_heads * self.head_dim),
            lora_ctx)
        # sandwich norms: normalize sublayer OUTPUT before the residual add
        res = res + rms_norm(attn_out, lp["post_norm"], self.rms_eps, off)
        normed2 = rms_norm(res, lp["pre_ff_norm"], self.rms_eps, off)
        res = res + rms_norm(self._mlp(lp, normed2, lora_ctx),
                             lp["post_ff_norm"], self.rms_eps, off)
        return res, new_cache

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.final_logit_cap:
            cap = self.final_logit_cap
            logits = jnp.tanh(logits / cap) * cap
        return logits
