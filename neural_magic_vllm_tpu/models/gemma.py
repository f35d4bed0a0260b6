"""Gemma / Gemma2 decoders (reference vllm/model_executor/models/gemma.py,
gemma2.py): GeGLU MLP, (1+w) RMSNorm convention, sqrt(H)-scaled embeddings,
tied lm_head; Gemma2 adds logit soft-capping and pre/post feedforward norms
with interleaved sliding-window attention."""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.layers.activation import gelu_and_mul
from neural_magic_vllm_tpu.layers.attention import Attention, \
    AttentionMetadata
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
from neural_magic_vllm_tpu.ops.kv_cache import KVCache


@register_model("GemmaForCausalLM")
class GemmaForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True
    norm_weight_offset = 1.0

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.hidden_act = getattr(cfg, "hidden_activation", None) or \
            getattr(cfg, "hidden_act", "gelu_pytorch_tanh")
        self.embed_scale = self.hidden_size**0.5
        self.tie_embeddings = True

    def _mlp(self, lp, x):
        lm = self.linear_method
        gate = lm.apply(lp["gate"], x)
        up = lm.apply(lp["up"], x)
        return lm.apply(lp["down"],
                        gelu_and_mul(gate, up, approximate="tanh"))

    def embed_tokens(self, params, token_ids):
        x = jnp.take(params["embed"], token_ids, axis=0)
        return x * jnp.asarray(self.embed_scale, x.dtype)

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill):
        lm = self.linear_method
        off = self.norm_weight_offset
        T = token_ids.shape[0]
        h = self.embed_tokens(params, token_ids)
        residual = h
        new_caches: List[KVCache] = []
        for i, lp in enumerate(params["layers"]):
            normed = rms_norm(residual, lp["input_norm"], self.rms_eps, off)
            q = lm.apply(lp["q"], normed).reshape(T, self.num_heads,
                                                  self.head_dim)
            k = lm.apply(lp["k"], normed).reshape(T, self.num_kv_heads,
                                                  self.head_dim)
            v = lm.apply(lp["v"], normed).reshape(T, self.num_kv_heads,
                                                  self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, new_cache = self.attn(q, k, v, kv_caches[i], meta,
                                            is_prefill=is_prefill)
            new_caches.append(new_cache)
            attn_out = lm.apply(
                lp["o"], attn_out.reshape(T, self.num_heads * self.head_dim))
            residual = residual + attn_out
            normed2 = rms_norm(residual, lp["post_norm"], self.rms_eps, off)
            residual = residual + self._mlp(lp, normed2)
        final = rms_norm(residual, params["final_norm"], self.rms_eps, off)
        return final, new_caches

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        params = super().load_params(model_dir)
        # Gemma always ties: lm_head materialized from embed in the base
        # loader when absent.
        return params
