"""DeepSeek-V2 decoder (reference vllm/model_executor/models/deepseek_v2.py).

MLA (multi-head latent attention) decompressed into standard paged attention
— the same strategy the reference uses (deepseek_v2.py:196-302): the
low-rank q/kv projections produce per-head q/k of qk_head_dim =
qk_nope_head_dim + qk_rope_head_dim; v (v_head_dim) is zero-padded to
qk_head_dim inside the paged cache and sliced after attention.

MoE: first_k_dense_replace leading layers are dense MLPs (executed by a
separate lax.scan over their own stacked params), remaining layers use
grouped-topk routed experts (n_group/topk_group) + n_shared_experts dense
shared experts scaled by routed_scaling_factor.
"""
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.layers.attention import Attention
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.layers.rotary import RotaryEmbedding
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import (LlamaForCausalLM,
                                                cast_params_to,
                                                stack_layer_params)
from neural_magic_vllm_tpu.ops.moe import fused_moe, grouped_topk


@register_model("DeepseekV2ForCausalLM")
class DeepseekV2ForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.q_lora_rank = getattr(cfg, "q_lora_rank", None)
        self.kv_lora_rank = cfg.kv_lora_rank
        self.qk_nope_dim = cfg.qk_nope_head_dim
        self.qk_rope_dim = cfg.qk_rope_head_dim
        self.qk_head_dim = self.qk_nope_dim + self.qk_rope_dim
        self.v_head_dim = cfg.v_head_dim
        self.head_dim = self.qk_head_dim  # paged-cache head size
        self.num_kv_heads = self.num_heads  # decompressed MHA

        # MoE structure
        self.first_dense = getattr(cfg, "first_k_dense_replace", 0)
        self.n_routed = getattr(cfg, "n_routed_experts", 0)
        self.n_shared = getattr(cfg, "n_shared_experts", 0)
        self.moe_intermediate = getattr(cfg, "moe_intermediate_size",
                                        self.intermediate_size)
        self.moe_top_k = getattr(cfg, "num_experts_per_tok", 2)
        self.n_group = getattr(cfg, "n_group", 1)
        self.topk_group = getattr(cfg, "topk_group", 1)
        self.routed_scaling = float(getattr(cfg, "routed_scaling_factor",
                                            1.0))
        self.norm_topk_prob = bool(getattr(cfg, "norm_topk_prob", False))

        # Rope on the decoupled rope dims only (reference applies per-head
        # rope to q_pe / shared k_pe; scale adjusted by yarn mscale)
        rope_scaling = (model_config.rope_scaling
                        or getattr(cfg, "rope_scaling", None))
        self.rope = RotaryEmbedding(self.qk_rope_dim, self.qk_rope_dim,
                                    getattr(cfg, "max_position_embeddings",
                                            4096),
                                    self.rope_theta, True, rope_scaling)
        scale = self.qk_head_dim**-0.5
        if rope_scaling and rope_scaling.get("type",
                                             rope_scaling.get(
                                                 "rope_type")) == "yarn":
            mscale_all = float(rope_scaling.get("mscale_all_dim", 0) or 0)
            factor = float(rope_scaling.get("factor", 1.0))
            if mscale_all and factor > 1:
                ms = 0.1 * mscale_all * math.log(factor) + 1.0
                scale = scale * ms * ms
        self.attn = Attention(self.num_heads, self.qk_head_dim,
                              self.num_kv_heads, scale=scale)

    # --- params -----------------------------------------------------------------
    def _attn_params(self, rng) -> Dict[str, Any]:
        lm = self.linear_method
        H, nh = self.hidden_size, self.num_heads
        p: Dict[str, Any] = {}
        if self.q_lora_rank:
            p["q_a"] = lm.create_params(rng, H, self.q_lora_rank, False)
            p["q_a_norm"] = np.ones((self.q_lora_rank, ), np.float32)
            p["q_b"] = lm.create_params(rng, self.q_lora_rank,
                                        nh * self.qk_head_dim, False)
        else:
            p["q"] = lm.create_params(rng, H, nh * self.qk_head_dim, False)
        p["kv_a"] = lm.create_params(
            rng, H, self.kv_lora_rank + self.qk_rope_dim, False)
        p["kv_a_norm"] = np.ones((self.kv_lora_rank, ), np.float32)
        p["kv_b"] = lm.create_params(
            rng, self.kv_lora_rank,
            nh * (self.qk_nope_dim + self.v_head_dim), False)
        p["o"] = lm.create_params(rng, nh * self.v_head_dim, H, False)
        return p

    def _dense_mlp_params(self, rng, inter) -> Dict[str, Any]:
        lm = self.linear_method
        H = self.hidden_size
        return {
            "gate": lm.create_params(rng, H, inter, False),
            "up": lm.create_params(rng, H, inter, False),
            "down": lm.create_params(rng, inter, H, False),
        }

    def _init_layer_at(self, rng, idx: int) -> Dict[str, Any]:
        H = self.hidden_size
        lp = {
            "input_norm": np.ones((H, ), np.float32),
            "post_norm": np.ones((H, ), np.float32),
        }
        lp.update(self._attn_params(rng))
        if idx < self.first_dense or not self.n_routed:
            lp["mlp"] = self._dense_mlp_params(rng, self.intermediate_size)
        else:
            E, I = self.n_routed, self.moe_intermediate
            scale = 1.0 / np.sqrt(H)
            lp["router"] = rng.uniform(-scale, scale,
                                       (H, E)).astype(np.float32)
            lp["experts"] = {
                "w_gate": rng.uniform(-scale, scale,
                                      (E, H, I)).astype(np.float32),
                "w_up": rng.uniform(-scale, scale,
                                    (E, H, I)).astype(np.float32),
                "w_down": rng.uniform(-scale, scale,
                                      (E, I, H)).astype(np.float32),
            }
            if self.n_shared:
                lp["shared"] = self._dense_mlp_params(
                    rng, I * self.n_shared)
        return lp

    def init_params(self, rng) -> Dict[str, Any]:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        nprng = np.random.default_rng(seed)
        H, V = self.hidden_size, self.vocab_size
        dense = [self._init_layer_at(nprng, i)
                 for i in range(self.first_dense)]
        moe = [self._init_layer_at(nprng, i)
               for i in range(self.first_dense, self.num_layers)]
        params = {
            "embed": (nprng.standard_normal(
                (V, H)) * 0.02).astype(np.float32),
            "final_norm": np.ones((H, ), np.float32),
            "lm_head": (nprng.standard_normal(
                (H, V)) * 0.02).astype(np.float32),
        }
        if dense:
            params["dense_layers"] = stack_layer_params(dense)
        params["layers"] = stack_layer_params(moe)
        return cast_params_to(params, self.dtype)

    def _attn_specs(self) -> Dict[str, Any]:
        lm = self.linear_method
        specs = {
            "kv_a": lm.param_specs("replicated", False),
            "kv_a_norm": P(None),
            "kv_b": lm.param_specs("column", False),
            "o": lm.param_specs("row", False),
        }
        if self.q_lora_rank:
            specs["q_a"] = lm.param_specs("replicated", False)
            specs["q_a_norm"] = P(None)
            specs["q_b"] = lm.param_specs("column", False)
        else:
            specs["q"] = lm.param_specs("column", False)
        return specs

    def _dense_mlp_specs(self):
        lm = self.linear_method
        return {
            "gate": lm.param_specs("column", False),
            "up": lm.param_specs("column", False),
            "down": lm.param_specs("row", False),
        }

    def param_specs(self) -> Dict[str, Any]:
        base = {"input_norm": P(None), "post_norm": P(None)}
        base.update(self._attn_specs())
        moe = dict(base)
        if self.n_routed:
            moe["router"] = P(None, None)
            moe["experts"] = {
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            }
            if self.n_shared:
                moe["shared"] = self._dense_mlp_specs()
        else:
            moe["mlp"] = self._dense_mlp_specs()
        dense = dict(base)
        dense["mlp"] = self._dense_mlp_specs()

        def add_layer_axis(tree):
            return jax.tree_util.tree_map(
                lambda s: P(None, *s), tree,
                is_leaf=lambda x: isinstance(x, P))

        out = {
            "embed": P("model", None),
            "final_norm": P(None),
            "lm_head": P(None, "model"),
            "layers": add_layer_axis(moe),
        }
        if self.first_dense:
            out["dense_layers"] = add_layer_axis(dense)
        return out

    # --- HF loading --------------------------------------------------------------
    _MLA_LINEARS = {
        "self_attn.q_proj": "q",
        "self_attn.q_a_proj": "q_a",
        "self_attn.q_b_proj": "q_b",
        "self_attn.kv_a_proj_with_mqa": "kv_a",
        "self_attn.kv_b_proj": "kv_b",
        "self_attn.o_proj": "o",
        "mlp.gate_proj": ("mlp", "gate"),
        "mlp.up_proj": ("mlp", "up"),
        "mlp.down_proj": ("mlp", "down"),
        "mlp.shared_experts.gate_proj": ("shared", "gate"),
        "mlp.shared_experts.up_proj": ("shared", "up"),
        "mlp.shared_experts.down_proj": ("shared", "down"),
    }

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if name == "model.embed_tokens.weight":
            params["embed"] = w
            return True
        if name == "model.norm.weight":
            params["final_norm"] = w
            return True
        if name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        sub = ".".join(parts[3:-1])
        kind = parts[-1]
        layer = layers[idx]
        lm = self.linear_method
        if sub == "input_layernorm":
            layer["input_norm"] = w
            return True
        if sub == "post_attention_layernorm":
            layer["post_norm"] = w
            return True
        if sub == "self_attn.q_a_layernorm":
            layer["q_a_norm"] = w
            return True
        if sub == "self_attn.kv_a_layernorm":
            layer["kv_a_norm"] = w
            return True
        if sub == "mlp.gate":
            layer["router"] = w.T.copy()
            return True
        if ".mlp.experts." in name:
            eidx = int(parts[5])
            proj = parts[6]
            raw = layer.setdefault("_raw_experts", {})
            raw.setdefault(proj, [None] * self.n_routed)[eidx] = w
            return True
        tgt = self._MLA_LINEARS.get(sub)
        if tgt is None or kind not in lm.hf_param_names:
            return False
        val = w.T.copy() if (kind in lm.hf_transpose and w.ndim == 2) else w
        if isinstance(tgt, tuple):
            layer.setdefault(tgt[0], {}).setdefault(tgt[1], {})[kind] = val
        else:
            layer.setdefault(tgt, {})[kind] = val
        return True

    _LINEAR_KEYS = ("q", "q_a", "q_b", "kv_a", "kv_b", "o")

    def _finalize_layers(self, layers: List[Dict]) -> None:
        lm = self.linear_method
        for layer in layers:
            for key in self._LINEAR_KEYS:
                if key in layer and isinstance(layer[key], dict) and \
                        not any(isinstance(v, dict)
                                for v in layer[key].values()):
                    layer[key] = lm.convert_hf(layer[key])
            for grp in ("mlp", "shared"):
                if grp in layer:
                    for k2, raw in layer[grp].items():
                        layer[grp][k2] = lm.convert_hf(raw)
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

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {}
        layers: List[Dict] = [dict() for _ in range(self.num_layers)]
        for name, w in iterate_safetensors(model_dir):
            self._load_into_layers(layers, name, w, params)
        if "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
        self._finalize_layers(layers)
        if self.first_dense:
            params["dense_layers"] = stack_layer_params(
                layers[:self.first_dense])
        params["layers"] = stack_layer_params(layers[self.first_dense:])
        return cast_params_to(params, self.dtype)

    # --- forward -----------------------------------------------------------------
    def _mla_attention(self, lp, res, rope_cos, rope_sin, k_cache, v_cache,
                       meta, is_prefill, layer_id=None):
        lm = self.linear_method
        T = res.shape[0]
        nh = self.num_heads
        normed = rms_norm(res, lp["input_norm"], self.rms_eps)
        if self.q_lora_rank:
            q_lat = rms_norm(lm.apply(lp["q_a"], normed), lp["q_a_norm"],
                             self.rms_eps)
            q = lm.apply(lp["q_b"], q_lat)
        else:
            q = lm.apply(lp["q"], normed)
        q = q.reshape(T, nh, self.qk_head_dim)
        q_nope, q_pe = q[..., :self.qk_nope_dim], q[..., self.qk_nope_dim:]

        kv_a = lm.apply(lp["kv_a"], normed)  # [T, kv_lora + rope]
        kv_latent = rms_norm(kv_a[:, :self.kv_lora_rank], lp["kv_a_norm"],
                             self.rms_eps)
        k_pe = kv_a[:, self.kv_lora_rank:][:, None, :]  # [T, 1, rope]
        kv_b = lm.apply(lp["kv_b"], kv_latent).reshape(
            T, nh, self.qk_nope_dim + self.v_head_dim)
        k_nope = kv_b[..., :self.qk_nope_dim]
        v = kv_b[..., self.qk_nope_dim:]

        q_pe, k_pe = self.rope.apply(rope_cos, rope_sin, q_pe, k_pe)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (T, nh, self.qk_rope_dim))],
            axis=-1)
        # pad v to qk_head_dim for the shared-head-size paged cache
        v_pad = jnp.pad(v, ((0, 0), (0, 0),
                            (0, self.qk_head_dim - self.v_head_dim)))
        attn_out, new_cache = self.attn(q, k, v_pad, (k_cache, v_cache),
                                        meta, is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb)
        attn_out = attn_out[..., :self.v_head_dim].reshape(
            T, nh * self.v_head_dim)
        return lm.apply(lp["o"], attn_out), new_cache

    def _dense_mlp(self, mp, x):
        lm = self.linear_method
        return lm.apply(mp["down"], silu_and_mul(
            lm.apply(mp["gate"], x), lm.apply(mp["up"], x)))

    def _moe_mlp(self, lp, x):
        router_logits = jnp.dot(x, lp["router"],
                                preferred_element_type=jnp.float32)
        weights, ids = grouped_topk(router_logits, self.moe_top_k,
                                    self.n_group, self.topk_group,
                                    renormalize=self.norm_topk_prob)
        out = fused_moe(x, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                        lp["experts"]["w_down"], weights,
                        ids) * jnp.asarray(self.routed_scaling, x.dtype)
        if self.n_shared:
            out = out + self._dense_mlp(lp["shared"], x)
        return out

    def _ds_layer(self, lp, res, rope_cos, rope_sin, k_c, v_c, meta,
                  is_prefill, is_moe: bool, layer_id=None):
        attn_out, new_cache = self._mla_attention(lp, res, rope_cos,
                                                  rope_sin, k_c, v_c, meta,
                                                  is_prefill, layer_id)
        res = res + attn_out
        normed2 = rms_norm(res, lp["post_norm"], self.rms_eps)
        if is_moe and self.n_routed:
            res = res + self._moe_mlp(lp, normed2)
        else:
            res = res + self._dense_mlp(lp["mlp"], normed2)
        return res, new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on DeepSeek-V2 MLA")
        assert mm is None  # text-only model
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
                res, (k_f, v_f) = self._ds_layer(lp, res, rope_cos,
                                                 rope_sin, k_f, v_f, meta,
                                                 is_prefill, is_moe, lid)
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
