"""Snowflake Arctic (reference vllm/model_executor/models/arctic.py):
llama attention; with moe_layer_frequency=2 layers alternate dense
(block_sparse_moe.mlp swiglu) and MoE (top-2 of 128 experts). MoE layers
with use_residual run TWO parallel branches off the post-attention stream
(arctic.py:330-357): residual_mlp(residual_layernorm(x)) plus
MoE(post_attention_layernorm(pre-attention residual_input)), summed back.
Routing renormalizes when top_k > 1 (arctic.py:170-174).

TPU design: alternating layer types are scanned as PAIRS — one lax.scan
whose xs carry (dense_lp, moe_lp) and the two layers' KV slices — keeping
compile time flat like the uniform llama scan."""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import (LlamaForCausalLM,
                                                cast_params_to,
                                                stack_layer_params)
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("ArcticForCausalLM")
class ArcticForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.num_experts = int(getattr(cfg, "num_local_experts", 0) or 0)
        self.top_k = int(getattr(cfg, "num_experts_per_tok", 1) or 1)
        self.moe_freq = int(getattr(cfg, "moe_layer_frequency", 2) or 2)
        self.use_residual = bool(getattr(cfg, "use_residual", True))
        if self.moe_freq not in (1, 2):
            raise NotImplementedError("arctic moe_layer_frequency > 2")
        if self.moe_freq == 2 and self.num_layers % 2:
            raise NotImplementedError("arctic odd layer count at freq 2")

    def _is_moe(self, idx: int) -> bool:
        return (idx + 1) % self.moe_freq == 0

    # --- params -------------------------------------------------------------
    def _attn_params(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        for k in ("gate", "up", "down"):
            lp.pop(k, None)
        return lp

    def _mlp_params(self, rng, inter) -> Dict[str, Any]:
        lm = self.linear_method
        H = self.hidden_size
        return {
            "gate": lm.create_params(rng, H, inter, False),
            "up": lm.create_params(rng, H, inter, False),
            "down": lm.create_params(rng, inter, H, False),
        }

    def _layer_params_at(self, rng, idx: int) -> Dict[str, Any]:
        lp = self._attn_params(rng)
        if not self._is_moe(idx):
            lp["mlp"] = self._mlp_params(rng, self.intermediate_size)
            return lp
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
        if self.use_residual:
            lp["residual_norm"] = np.ones((H, ), np.float32)
            lp["residual_mlp"] = self._mlp_params(rng, H)
        return lp

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        nprng = np.random.default_rng(seed)
        layers = [self._layer_params_at(nprng, i)
                  for i in range(self.num_layers)]
        H, V = self.hidden_size, self.vocab_size
        params: Dict[str, Any] = {
            "embed": (nprng.standard_normal(
                (V, H)) * 0.02).astype(np.float32),
            "final_norm": np.ones((H, ), np.float32),
            "lm_head": (nprng.standard_normal(
                (H, V)) * 0.02).astype(np.float32),
        }
        self._stack(params, layers)
        return cast_params_to(params, self.dtype)

    def _stack(self, params, layers: List[Dict]) -> None:
        if self.moe_freq == 1:
            params["layers"] = stack_layer_params(layers)
        else:
            params["dense_layers"] = stack_layer_params(layers[0::2])
            params["layers"] = stack_layer_params(layers[1::2])

    def param_specs(self) -> Dict[str, Any]:
        lm = self.linear_method
        specs = super().param_specs()
        base = {k: v for k, v in specs["layers"].items()
                if k not in ("gate", "up", "down")}

        def mlp_specs():
            add_l = lambda s: P(None, *s)  # noqa: E731
            return {
                k: jax.tree_util.tree_map(
                    add_l,
                    lm.param_specs("column" if k != "down" else "row",
                                   False),
                    is_leaf=lambda x: isinstance(x, P))
                for k in ("gate", "up", "down")}

        dense = dict(base)
        dense["mlp"] = mlp_specs()
        moe = dict(base)
        moe["router"] = P(None, None, None)
        moe["experts"] = {
            "w_gate": P(None, None, None, "model"),
            "w_up": P(None, None, None, "model"),
            "w_down": P(None, None, "model", None),
        }
        if self.use_residual:
            moe["residual_norm"] = P(None, None)
            moe["residual_mlp"] = mlp_specs()
        specs["layers"] = moe
        if self.moe_freq == 2:
            specs["dense_layers"] = dense
        return specs

    # --- loading ------------------------------------------------------------
    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        layer = layers[int(parts[2])]
        sub = ".".join(parts[3:-1])
        proj_map = {"w1": "gate", "w3": "up", "w2": "down"}
        if sub.startswith("residual_mlp."):
            key = proj_map[parts[4]]
            layer.setdefault("residual_mlp", {})[key] = \
                {"weight": w.T.copy()}
            return True
        if sub == "residual_layernorm":
            layer["residual_norm"] = w
            return True
        if sub == "block_sparse_moe.gate":
            layer["router"] = w.T.copy()
            return True
        if sub.startswith("block_sparse_moe.mlp."):
            key = proj_map[parts[5]]
            layer.setdefault("mlp", {})[key] = {"weight": w.T.copy()}
            return True
        if "block_sparse_moe.experts" in name:
            eidx, wname = int(parts[5]), parts[6]
            raw = layer.setdefault("_raw_experts", {})
            raw.setdefault(wname, [None] * self.num_experts)[eidx] = w
            return True
        return False

    def _finalize_layers(self, layers: List[Dict]) -> None:
        lm = self.linear_method
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is not None:
                layer["experts"] = {
                    "w_gate": np.stack(raw["w1"]).transpose(0, 2, 1).copy(),
                    "w_up": np.stack(raw["w3"]).transpose(0, 2, 1).copy(),
                    "w_down": np.stack(raw["w2"]).transpose(0, 2, 1).copy(),
                }
            for key in ("mlp", "residual_mlp"):
                if key in layer:
                    layer[key] = {k: lm.convert_hf(v)
                                  for k, v in layer[key].items()}
        super()._finalize_layers(layers)

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {}
        layers: List[Dict] = [dict() for _ in range(self.num_layers)]
        for name, w in iterate_safetensors(model_dir):
            self._load_into_layers(layers, name, w, params)
        if self.tie_embeddings or "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
        self._finalize_layers(layers)
        self._stack(params, layers)
        return cast_params_to(params, self.dtype)

    # --- forward ------------------------------------------------------------
    def _dense_mlp(self, mp, x):
        lm = self.linear_method
        return lm.apply(mp["down"], silu_and_mul(
            lm.apply(mp["gate"], x), lm.apply(mp["up"], x)))

    def _moe_mlp(self, lp, x):
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.top_k,
                                    renormalize=self.top_k > 1)
        return fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                         lp["experts"]["w_down"], weights, ids)

    def _attn_block(self, lp, res, rope_cos, rope_sin, k_cache, v_cache,
                    meta, is_prefill, layer_id):
        T = res.shape[0]
        normed = rms_norm(res, lp["input_norm"], self.rms_eps)
        q = self._linear(lp, "q", normed).reshape(T, self.num_heads,
                                                  self.head_dim)
        k = self._linear(lp, "k", normed).reshape(T, self.num_kv_heads,
                                                  self.head_dim)
        v = self._linear(lp, "v", normed).reshape(T, self.num_kv_heads,
                                                  self.head_dim)
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb,
                                        kv_scales=lp.get("kv_scales"))
        out = self._linear(
            lp, "o", attn_out.reshape(T, self.num_heads * self.head_dim))
        return out, new_cache

    def _arctic_layer(self, lp, res, rope_cos, rope_sin, k_c, v_c, meta,
                      is_prefill, is_moe: bool, layer_id=None):
        residual_input = res
        attn_out, new_cache = self._attn_block(lp, res, rope_cos, rope_sin,
                                               k_c, v_c, meta, is_prefill,
                                               layer_id)
        res = residual_input + attn_out
        if is_moe and self.use_residual:
            # two parallel branches (arctic.py:343-356): residual_mlp off
            # the post-attn stream, MoE off the normed PRE-attn input
            rm = self._dense_mlp(lp["residual_mlp"],
                                 rms_norm(res, lp["residual_norm"],
                                          self.rms_eps))
            moe = self._moe_mlp(lp, rms_norm(residual_input,
                                             lp["post_norm"], self.rms_eps))
            return res + rm + moe, new_cache
        normed2 = rms_norm(res, lp["post_norm"], self.rms_eps)
        if is_moe:
            return res + self._moe_mlp(lp, normed2), new_cache
        return res + self._dense_mlp(lp["mlp"], normed2), new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Arctic")
        assert mm is None
        k_stack, v_stack = kv_caches
        L, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((L * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((L * nb, ) + v_stack.shape[2:])
        x = self.embed_tokens(params, token_ids)
        rope_cos, rope_sin = self.rope.precompute(positions)

        if self.moe_freq == 1:
            def body1(carry, xs_):
                res, k_f, v_f = carry
                lp, lid = xs_
                res, (k_f, v_f) = self._arctic_layer(
                    lp, res, rope_cos, rope_sin, k_f, v_f, meta,
                    is_prefill, True, lid)
                return (res, k_f, v_f), None

            (x, k_flat, v_flat), _ = jax.lax.scan(
                body1, (x, k_flat, v_flat),
                (params["layers"], jnp.arange(L, dtype=jnp.int32)))
            final = rms_norm(x, params["final_norm"], self.rms_eps)
            return final, (k_flat.reshape(k_stack.shape),
                           v_flat.reshape(v_stack.shape))

        # freq == 2: scan over (dense, moe) layer pairs
        def pair_body(carry, xs_):
            res, k_f, v_f = carry
            dlp, mlp_, pair = xs_
            res, (k_f, v_f) = self._arctic_layer(
                dlp, res, rope_cos, rope_sin, k_f, v_f, meta, is_prefill,
                False, 2 * pair)
            res, (k_f, v_f) = self._arctic_layer(
                mlp_, res, rope_cos, rope_sin, k_f, v_f, meta, is_prefill,
                True, 2 * pair + 1)
            return (res, k_f, v_f), None

        (x, k_flat, v_flat), _ = jax.lax.scan(
            pair_body, (x, k_flat, v_flat),
            (params["dense_layers"], params["layers"],
             jnp.arange(L // 2, dtype=jnp.int32)))
        final = rms_norm(x, params["final_norm"], self.rms_eps)
        return final, (k_flat.reshape(k_stack.shape),
                       v_flat.reshape(v_stack.shape))
