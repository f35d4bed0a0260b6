"""Llama-family decoder (Llama 2/3, Mistral, TinyLlama).

Capability parity with the reference vllm/model_executor/models/llama.py,
re-designed for TPU: pure-functional forward over a param pytree, paged KV
caches threaded through and donated, TP expressed as PartitionSpecs on params
(GSPMD inserts the all-reduces the reference does explicitly in
RowParallelLinear).
"""
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.layers.attention import Attention, \
    AttentionMetadata
from neural_magic_vllm_tpu.layers.linear import (LinearMethod,
                                                 UnquantizedLinearMethod,
                                                 get_linear_method)
from neural_magic_vllm_tpu.layers.norm import fused_add_rms_norm, rms_norm
from neural_magic_vllm_tpu.layers.rotary import get_rope
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.ops.kv_cache import KVCache


@register_model("LlamaForCausalLM", "LLaMAForCausalLM",
                "MistralForCausalLM")
class LlamaForCausalLM:
    """Functional model definition. Params are a plain pytree; all methods
    are trace-safe and called under jit by the model runner."""

    # Subclass knobs (qwen2 sets qkv_bias=True, etc.)
    qkv_bias = False
    tie_word_embeddings_default = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        self.cfg = cfg
        self.dtype = jnp.dtype(model_config.dtype)
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    cfg.num_attention_heads)
        self.head_dim = (getattr(cfg, "head_dim", None)
                         or cfg.hidden_size // cfg.num_attention_heads)
        self.intermediate_size = cfg.intermediate_size
        self.vocab_size = cfg.vocab_size
        self.rms_eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.rope_theta = (model_config.rope_theta
                           or getattr(cfg, "rope_theta", 10000.0))
        self.tie_embeddings = getattr(cfg, "tie_word_embeddings",
                                      self.tie_word_embeddings_default)
        self.sliding_window = model_config.get_sliding_window() \
            if hasattr(model_config, "get_sliding_window") else None

        rope_scaling = (model_config.rope_scaling
                        or getattr(cfg, "rope_scaling", None))
        self.rope = get_rope(self.head_dim, None,
                             getattr(cfg, "max_position_embeddings", 2048),
                             self.rope_theta, True, rope_scaling)
        self.linear_method: LinearMethod = get_linear_method(quant_config)
        self.attn = Attention(self.num_heads, self.head_dim,
                              self.num_kv_heads,
                              scale=self.head_dim**-0.5,
                              sliding_window=self.sliding_window)

    # --- params ---------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Random init (DummyModelLoader analogue, loader.py:309)."""
        lm = self.linear_method
        keys = jax.random.split(rng, self.num_layers + 3)
        H, I = self.hidden_size, self.intermediate_size
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim

        def layer_params(key):
            ks = jax.random.split(key, 7)
            return {
                "input_norm": jnp.ones((H, ), self.dtype),
                "post_norm": jnp.ones((H, ), self.dtype),
                "q": lm.create_params(ks[0], H, nh * hd, self.dtype,
                                      self.qkv_bias),
                "k": lm.create_params(ks[1], H, kvh * hd, self.dtype,
                                      self.qkv_bias),
                "v": lm.create_params(ks[2], H, kvh * hd, self.dtype,
                                      self.qkv_bias),
                "o": lm.create_params(ks[3], nh * hd, H, self.dtype, False),
                "gate": lm.create_params(ks[4], H, I, self.dtype, False),
                "up": lm.create_params(ks[5], H, I, self.dtype, False),
                "down": lm.create_params(ks[6], I, H, self.dtype, False),
            }

        params = {
            "embed":
            jax.random.normal(keys[0], (self.vocab_size, H),
                              self.dtype) * 0.02,
            "layers": [layer_params(keys[i + 1])
                       for i in range(self.num_layers)],
            "final_norm": jnp.ones((H, ), self.dtype),
        }
        if not self.tie_embeddings:
            params["lm_head"] = jax.random.normal(
                keys[-1], (H, self.vocab_size), self.dtype) * 0.02
        return params

    def param_specs(self) -> Dict[str, Any]:
        """PartitionSpec tree parallel to params (TP over the "model" mesh
        axis: column-parallel q/k/v/gate/up, row-parallel o/down, vocab-
        sharded embedding/lm_head, reference linear.py:227,690)."""
        lm = self.linear_method

        def layer_specs():
            return {
                "input_norm": P(None),
                "post_norm": P(None),
                "q": lm.param_specs("column", self.qkv_bias),
                "k": lm.param_specs("column", self.qkv_bias),
                "v": lm.param_specs("column", self.qkv_bias),
                "o": lm.param_specs("row", False),
                "gate": lm.param_specs("column", False),
                "up": lm.param_specs("column", False),
                "down": lm.param_specs("row", False),
            }

        specs = {
            "embed": P("model", None),
            "layers": [layer_specs() for _ in range(self.num_layers)],
            "final_norm": P(None),
        }
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "model")
        return specs

    # --- HF checkpoint loading -------------------------------------------------
    # (name mapping analogue of reference llama.py load_weights:433-488)
    _HF_LINEARS = {
        "self_attn.q_proj": "q",
        "self_attn.k_proj": "k",
        "self_attn.v_proj": "v",
        "self_attn.o_proj": "o",
        "mlp.gate_proj": "gate",
        "mlp.up_proj": "up",
        "mlp.down_proj": "down",
    }

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        np_dtype = np.float32
        params: Dict[str, Any] = {
            "layers": [dict() for _ in range(self.num_layers)]
        }
        for name, w in iterate_safetensors(model_dir):
            if name == "model.embed_tokens.weight":
                params["embed"] = w.astype(np_dtype)
            elif name == "model.norm.weight":
                params["final_norm"] = w.astype(np_dtype)
            elif name == "lm_head.weight":
                params["lm_head"] = w.T.astype(np_dtype)
            elif name.startswith("model.layers."):
                parts = name.split(".")
                idx = int(parts[2])
                sub = ".".join(parts[3:-1])
                kind = parts[-1]  # weight | bias
                layer = params["layers"][idx]
                if sub == "input_layernorm":
                    layer["input_norm"] = w.astype(np_dtype)
                elif sub == "post_attention_layernorm":
                    layer["post_norm"] = w.astype(np_dtype)
                elif sub in self._HF_LINEARS:
                    tgt = layer.setdefault(self._HF_LINEARS[sub], {})
                    if kind == "weight":
                        tgt["weight"] = w.T.astype(np_dtype)
                    else:
                        tgt["bias"] = w.astype(np_dtype)
        if self.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
            self.tie_embeddings = False  # materialized
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=self.dtype), params)

    # --- forward -----------------------------------------------------------------
    def embed_tokens(self, params, token_ids: jax.Array) -> jax.Array:
        return jnp.take(params["embed"], token_ids, axis=0)

    def _mlp(self, lp, x):
        lm = self.linear_method
        gate = lm.apply(lp["gate"], x)
        up = lm.apply(lp["up"], x)
        return lm.apply(lp["down"], silu_and_mul(gate, up))

    def forward(
        self,
        params: Dict[str, Any],
        token_ids: jax.Array,  # [T]
        positions: jax.Array,  # [T]
        kv_caches: List[KVCache],
        meta: AttentionMetadata,
        *,
        is_prefill: bool,
    ) -> Tuple[jax.Array, List[KVCache]]:
        lm = self.linear_method
        T = token_ids.shape[0]
        x = self.embed_tokens(params, token_ids)
        residual = jnp.zeros_like(x)
        new_caches: List[KVCache] = []
        h = x
        # first layer norm is not fused with a residual add
        for i, lp in enumerate(params["layers"]):
            if i == 0:
                normed = rms_norm(h, lp["input_norm"], self.rms_eps)
                residual = h
            else:
                normed, residual = fused_add_rms_norm(
                    h, residual, lp["input_norm"], self.rms_eps)
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
            attn_out = lm.apply(lp["o"],
                                attn_out.reshape(T,
                                                 self.num_heads *
                                                 self.head_dim))
            normed2, residual = fused_add_rms_norm(attn_out, residual,
                                                   lp["post_norm"],
                                                   self.rms_eps)
            h = self._mlp(lp, normed2)
        final, _ = fused_add_rms_norm(h, residual, params["final_norm"],
                                      self.rms_eps)
        return final, new_caches

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        """[T, H] -> [T, V] fp32 (reference LogitsProcessor)."""
        lm_head = params["lm_head"]
        return jnp.dot(hidden, lm_head,
                       preferred_element_type=jnp.float32)
