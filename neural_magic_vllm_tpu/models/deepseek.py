"""DeepSeek (v1) MoE decoder (reference
vllm/model_executor/models/deepseek.py): llama attention + routed experts
with softmax top-k (renormalize=norm_topk_prob, deepseek.py:161) and
n_shared_experts dense experts added unconditionally (deepseek.py:152-168).
The first first_k_dense_replace layers are dense MLPs (deepseek.py:278-280)
and run as their own lax.scan over separately stacked params (same
structure as deepseek_v2.py here). Dense checkpoints (n_routed_experts
absent) are plain llama and load through the base class."""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import (LlamaForCausalLM,
                                                stack_layer_params)
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("DeepseekForCausalLM")
class DeepseekForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.n_routed = int(getattr(cfg, "n_routed_experts", 0) or 0)
        self.n_shared = int(getattr(cfg, "n_shared_experts", 0) or 0)
        self.moe_top_k = int(getattr(cfg, "num_experts_per_tok", 0) or 0)
        self.moe_intermediate = int(
            getattr(cfg, "moe_intermediate_size", 0) or 0)
        self.norm_topk_prob = bool(getattr(cfg, "norm_topk_prob", False))
        self.first_dense = int(getattr(cfg, "first_k_dense_replace", 0) or 0)
        if self.n_routed and \
                int(getattr(cfg, "moe_layer_freq", 1) or 1) != 1:
            raise NotImplementedError("deepseek moe_layer_freq != 1")

    # --- params -------------------------------------------------------------
    def _moe_layer_params(self, rng) -> Dict[str, Any]:
        lp = super()._init_layer(rng)
        for k in ("gate", "up", "down"):
            lp.pop(k, None)
        H, I, E = self.hidden_size, self.moe_intermediate, self.n_routed
        scale = 1.0 / np.sqrt(H)
        lp["router"] = rng.uniform(-scale, scale, (H, E)).astype(np.float32)
        lp["experts"] = {
            "w_gate": rng.uniform(-scale, scale,
                                  (E, H, I)).astype(np.float32),
            "w_up": rng.uniform(-scale, scale, (E, H, I)).astype(np.float32),
            "w_down": rng.uniform(-scale, scale,
                                  (E, I, H)).astype(np.float32),
        }
        if self.n_shared:
            S = I * self.n_shared
            lm = self.linear_method
            lp["shared"] = {
                "gate": lm.create_params(rng, H, S, False),
                "up": lm.create_params(rng, H, S, False),
                "down": lm.create_params(rng, S, H, False),
            }
        return lp

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if not self.n_routed:
            return super().init_params(rng)
        from neural_magic_vllm_tpu.models.llama import cast_params_to
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        nprng = np.random.default_rng(seed)
        fd = self.first_dense
        dense = [super()._init_layer(nprng) for _ in range(fd)]
        moe = [self._moe_layer_params(nprng)
               for _ in range(fd, self.num_layers)]
        H, V = self.hidden_size, self.vocab_size
        params: Dict[str, Any] = {
            "embed": (nprng.standard_normal(
                (V, H)) * 0.02).astype(np.float32),
            "final_norm": np.ones((H, ), np.float32),
            "lm_head": (nprng.standard_normal(
                (H, V)) * 0.02).astype(np.float32),
            "layers": stack_layer_params(moe),
        }
        if dense:
            params["dense_layers"] = stack_layer_params(dense)
        return cast_params_to(params, self.dtype)

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        if not self.n_routed:
            return specs
        lm = self.linear_method
        base = dict(specs["layers"])
        dense_specs = {k: base[k] for k in base
                       if k not in ("gate", "up", "down")}
        moe = dict(dense_specs)
        moe["router"] = P(None, None, None)
        moe["experts"] = {
            "w_gate": P(None, None, None, "model"),
            "w_up": P(None, None, None, "model"),
            "w_down": P(None, None, "model", None),
        }
        if self.n_shared:
            add_l = lambda s: P(None, *s)  # noqa: E731
            moe["shared"] = {
                "gate": jax.tree_util.tree_map(
                    add_l, lm.param_specs("column", False),
                    is_leaf=lambda x: isinstance(x, P)),
                "up": jax.tree_util.tree_map(
                    add_l, lm.param_specs("column", False),
                    is_leaf=lambda x: isinstance(x, P)),
                "down": jax.tree_util.tree_map(
                    add_l, lm.param_specs("row", False),
                    is_leaf=lambda x: isinstance(x, P)),
            }
        specs["layers"] = moe
        if self.first_dense:
            specs["dense_layers"] = {
                k: v for k, v in dense_specs.items()}
            specs["dense_layers"].update({
                k: jax.tree_util.tree_map(
                    lambda s: P(None, *s),
                    lm.param_specs("column" if k != "down" else "row",
                                   False),
                    is_leaf=lambda x: isinstance(x, P))
                for k in ("gate", "up", "down")})
        return specs

    # --- loading ------------------------------------------------------------
    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not (self.n_routed and name.startswith("model.layers.")):
            return False
        parts = name.split(".")
        layer = layers[int(parts[2])]
        sub = ".".join(parts[3:-1])
        if sub == "mlp.gate":
            layer["router"] = w.T.copy()
            return True
        if ".mlp.experts." in name:
            eidx, proj = int(parts[5]), parts[6]
            raw = layer.setdefault("_raw_experts", {})
            raw.setdefault(proj, [None] * self.n_routed)[eidx] = w
            return True
        if ".mlp.shared_experts." in name:
            proj = parts[5]
            key = {"gate_proj": "gate", "up_proj": "up",
                   "down_proj": "down"}[proj]
            layer.setdefault("shared", {})[key] = {"weight": w.T.copy()}
            return True
        return False

    def _finalize_layers(self, layers: List[Dict]) -> None:
        lm = self.linear_method
        for layer in layers:
            raw = layer.pop("_raw_experts", None)
            if raw is not None:
                layer["experts"] = {
                    "w_gate": np.stack(raw["gate_proj"]).transpose(
                        0, 2, 1).copy(),
                    "w_up": np.stack(raw["up_proj"]).transpose(0, 2,
                                                               1).copy(),
                    "w_down": np.stack(raw["down_proj"]).transpose(
                        0, 2, 1).copy(),
                }
            if "shared" in layer:
                layer["shared"] = {k: lm.convert_hf(v)
                                   for k, v in layer["shared"].items()}
        super()._finalize_layers(layers)

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        if not self.n_routed:
            return super().load_params(model_dir)
        from neural_magic_vllm_tpu.models.llama import cast_params_to
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {}
        layers: List[Dict] = [dict() for _ in range(self.num_layers)]
        for name, w in iterate_safetensors(model_dir):
            self._load_into_layers(layers, name, w, params)
        if self.tie_embeddings or "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
        self._finalize_layers(layers)
        fd = self.first_dense
        if fd:
            params["dense_layers"] = stack_layer_params(layers[:fd])
        params["layers"] = stack_layer_params(layers[fd:])
        return cast_params_to(params, self.dtype)

    # --- forward ------------------------------------------------------------
    def _moe_mlp(self, lp, x):
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(router_logits, self.moe_top_k,
                                    renormalize=self.norm_topk_prob)
        out = fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                        lp["experts"]["w_down"], weights, ids)
        if self.n_shared:
            lm = self.linear_method
            sh = lp["shared"]
            out = out + lm.apply(sh["down"], silu_and_mul(
                lm.apply(sh["gate"], x), lm.apply(sh["up"], x)))
        return out

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, lora_ctx=None, layer_id=None,
               is_moe: bool = False):
        if not (is_moe and self.n_routed):
            return super()._layer(lp, res, rope_cos, rope_sin, k_cache,
                                  v_cache, meta, is_prefill, lora_ctx,
                                  layer_id)
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
        res = res + self._linear(
            lp, "o", attn_out.reshape(T, self.num_heads * self.head_dim))
        normed2 = rms_norm(res, lp["post_norm"], self.rms_eps)
        return res + self._moe_mlp(lp, normed2), new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        if not self.n_routed:
            return super().forward(params, token_ids, positions, kv_caches,
                                   meta, is_prefill=is_prefill, lora=lora,
                                   lora_idx=lora_idx, mm=mm)
        if lora is not None:
            raise NotImplementedError("LoRA on DeepSeek MoE")
        assert mm is None
        k_stack, v_stack = kv_caches
        L, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((L * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((L * nb, ) + v_stack.shape[2:])
        x = self.embed_tokens(params, token_ids)
        rope_cos, rope_sin = self.rope.precompute(positions)
        fd = self.first_dense

        def scan_layers(x, k_f, v_f, layer_params, lid0, n, is_moe):
            def body(carry, xs_):
                res, k_f, v_f = carry
                lp, lid = xs_
                res, (k_f, v_f) = self._layer(lp, res, rope_cos, rope_sin,
                                              k_f, v_f, meta, is_prefill,
                                              layer_id=lid, is_moe=is_moe)
                return (res, k_f, v_f), None

            lids = lid0 + jnp.arange(n, dtype=jnp.int32)
            (x, k_f, v_f), _ = jax.lax.scan(body, (x, k_f, v_f),
                                            (layer_params, lids))
            return x, k_f, v_f

        if fd:
            x, k_flat, v_flat = scan_layers(x, k_flat, v_flat,
                                            params["dense_layers"], 0, fd,
                                            False)
            x, k_flat, v_flat = scan_layers(x, k_flat, v_flat,
                                            params["layers"], fd, L - fd,
                                            True)
        else:
            x, k_flat, v_flat = scan_layers(x, k_flat, v_flat,
                                            params["layers"], 0, L, True)
        final = rms_norm(x, params["final_norm"], self.rms_eps)
        return final, (k_flat.reshape(k_stack.shape),
                       v_flat.reshape(v_stack.shape))
