"""Jamba: hybrid Mamba + attention + MoE decoder (AI21).

Capability parity with the reference vllm/model_executor/models/jamba.py,
re-designed for TPU:
- recurrent per-sequence state (conv tail + SSM state) lives in slot
  arrays carried INSIDE the cache pytree — the step executable updates
  KV pages and mamba slots in one donated in-place pass (the reference
  splits this across MambaCacheManager CUDA buffers).
- heterogeneous layers run as an unrolled loop (layer types differ per
  index; Jamba's period-8 pattern means ~4x trace reuse is possible later
  via a period scan — correctness first).
- attention layers have NO positional encoding (Jamba design), share the
  paged-KV machinery, and only attention layers consume KV stacks —
  cache sizing counts them via ModelConfig.get_num_layers.

Supported serving paths: single-sequence (chunked) prefill + plain batch
decode. Prefix caching, CoW forking (best_of>1/beam), CPU swap,
multi-step and speculative decode are rejected for stateful models
(mamba state cannot be reconstructed from KV blocks).
"""
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import silu_and_mul
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
from neural_magic_vllm_tpu.ops.mamba import (mamba_mixer_decode,
                                             mamba_mixer_seq)
from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax


@register_model("JambaForCausalLM")
class JambaForCausalLM(LlamaForCausalLM):
    has_state = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        self.d_state = cfg.mamba_d_state
        self.d_conv = cfg.mamba_d_conv
        self.d_inner = cfg.mamba_expand * cfg.hidden_size
        dtr = getattr(cfg, "mamba_dt_rank", "auto")
        self.dt_rank = math.ceil(cfg.hidden_size / 16) if dtr == "auto" \
            else dtr
        self.num_experts = getattr(cfg, "num_experts", 1)
        self.top_k = getattr(cfg, "num_experts_per_tok", 1)
        ap, ao = cfg.attn_layer_period, cfg.attn_layer_offset
        ep, eo = cfg.expert_layer_period, cfg.expert_layer_offset
        self.layer_is_attn = [i % ap == ao for i in range(self.num_layers)]
        self.layer_is_moe = [
            self.num_experts > 1 and i % ep == eo
            for i in range(self.num_layers)
        ]
        self.num_attn_layers = sum(self.layer_is_attn)
        self.num_mamba_layers = self.num_layers - self.num_attn_layers

    # --- recurrent-state slots -------------------------------------------------
    def state_arrays(self, num_slots: int) -> Dict[str, jax.Array]:
        """Slot-indexed recurrent state, appended to the cache pytree.
        Row num_slots is a write-off scratch slot for padded batch rows."""
        nm = self.num_mamba_layers
        return {
            "conv": jnp.zeros(
                (nm, num_slots + 1, self.d_conv - 1, self.d_inner),
                self.dtype),
            "ssm": jnp.zeros(
                (nm, num_slots + 1, self.d_inner, self.d_state),
                jnp.float32),
        }

    # --- params ---------------------------------------------------------------
    def _init_layer_jamba(self, rng: np.random.Generator,
                          idx: int) -> Dict[str, Any]:
        lm = self.linear_method
        H, I = self.hidden_size, self.intermediate_size
        Di, Ds, Dc = self.d_inner, self.d_state, self.d_conv
        lp: Dict[str, Any] = {
            "input_norm": np.ones((H, ), np.float32),
            "pre_ff_norm": np.ones((H, ), np.float32),
        }

        def u(i, o):
            s = 1.0 / np.sqrt(i)
            return rng.uniform(-s, s, (i, o)).astype(np.float32)

        if self.layer_is_attn[idx]:
            nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
            lp.update(q=lm.create_params(rng, H, nh * hd, False),
                      k=lm.create_params(rng, H, kvh * hd, False),
                      v=lm.create_params(rng, H, kvh * hd, False),
                      o=lm.create_params(rng, nh * hd, H, False))
        else:
            lp["mamba"] = {
                "in_proj": u(H, 2 * Di),
                "conv_w": u(Dc, Di),
                "conv_b": np.zeros((Di, ), np.float32),
                "x_proj": u(Di, self.dt_rank + 2 * Ds),
                "dt_proj": u(self.dt_rank, Di),
                "dt_proj_b": np.zeros((Di, ), np.float32),
                "dt_norm": np.ones((self.dt_rank, ), np.float32),
                "b_norm": np.ones((Ds, ), np.float32),
                "c_norm": np.ones((Ds, ), np.float32),
                "A_log": np.log(np.tile(np.arange(1, Ds + 1, dtype=np.float32),
                                        (Di, 1))),
                "D": np.ones((Di, ), np.float32),
                "out_proj": u(Di, H),
            }
        if self.layer_is_moe[idx]:
            lp["router"] = u(H, self.num_experts)
            lp["experts"] = {
                "w_gate": np.stack([u(H, I) for _ in
                                    range(self.num_experts)]),
                "w_up": np.stack([u(H, I) for _ in range(self.num_experts)]),
                "w_down": np.stack([u(I, H) for _ in
                                    range(self.num_experts)]),
            }
        else:
            lp.update(gate=lm.create_params(rng, H, I, False),
                      up=lm.create_params(rng, H, I, False),
                      down=lm.create_params(rng, I, H, False))
        return lp

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.llama import cast_params_to
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        nprng = np.random.default_rng(seed)
        H, V = self.hidden_size, self.vocab_size
        layers = [self._init_layer_jamba(nprng, i)
                  for i in range(self.num_layers)]
        embed = (nprng.standard_normal((V, H)) * 0.02).astype(np.float32)
        params = {
            "embed": embed,
            "layers": layers,
            "final_norm": np.ones((H, ), np.float32),
            "lm_head": (nprng.standard_normal((H, V)) *
                        0.02).astype(np.float32)
            if not self.tie_embeddings else embed.T.copy(),
        }
        return cast_params_to(params, self.dtype)

    def param_specs(self) -> Dict[str, Any]:
        # Mamba/MoE TP sharding is a later-round optimization: everything
        # but the embedding tables is replicated (lookup_spec default).
        return {
            "embed": P("model", None),
            "final_norm": P(None),
            "lm_head": P(None, "model"),
        }

    # --- HF checkpoint loading -------------------------------------------------
    _MAMBA_MAP = {
        "in_proj.weight": ("in_proj", True),
        "x_proj.weight": ("x_proj", True),
        "dt_proj.weight": ("dt_proj", True),
        "dt_proj.bias": ("dt_proj_b", False),
        "conv1d.bias": ("conv_b", False),
        "out_proj.weight": ("out_proj", True),
        "dt_layernorm.weight": ("dt_norm", False),
        "b_layernorm.weight": ("b_norm", False),
        "c_layernorm.weight": ("c_norm", False),
        "A_log": ("A_log", False),
        "D": ("D", False),
    }

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if name == "model.embed_tokens.weight":
            params["embed"] = w
            return True
        if name == "model.final_layernorm.weight":
            params["final_norm"] = w
            return True
        if name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        layer = layers[idx]
        rest = ".".join(parts[3:])
        if rest == "input_layernorm.weight":
            layer["input_norm"] = w
            return True
        if rest == "pre_ff_layernorm.weight":
            layer["pre_ff_norm"] = w
            return True
        if parts[3] == "mamba":
            sub = ".".join(parts[4:])
            m = layer.setdefault("mamba", {})
            if sub == "conv1d.weight":  # [d_inner, 1, d_conv]
                m["conv_w"] = w[:, 0, :].T.copy()
                return True
            if sub in self._MAMBA_MAP:
                key, transpose = self._MAMBA_MAP[sub]
                m[key] = w.T.copy() if transpose and w.ndim == 2 else w
                return True
            return False
        if parts[3] == "self_attn":
            lm = self.linear_method
            tgt_name = {"q_proj": "q", "k_proj": "k", "v_proj": "v",
                        "o_proj": "o"}.get(parts[4])
            if tgt_name is None or parts[5] not in lm.hf_param_names:
                return False
            tgt = layer.setdefault(tgt_name, {})
            tgt[parts[5]] = w.T.copy() \
                if (parts[5] in lm.hf_transpose and w.ndim == 2) else w
            return True
        if parts[3] == "feed_forward":
            if parts[4] == "router":
                layer["router"] = w.T.copy()
                return True
            if parts[4] == "experts":
                eidx = int(parts[5])
                proj = parts[6]
                raw = layer.setdefault("_raw_experts", {})
                raw.setdefault(proj, [None] * self.num_experts)[eidx] = w
                return True
            if parts[4] in ("gate_proj", "up_proj", "down_proj"):
                lm = self.linear_method
                key = {"gate_proj": "gate", "up_proj": "up",
                       "down_proj": "down"}[parts[4]]
                tgt = layer.setdefault(key, {})
                tgt[parts[5]] = w.T.copy() \
                    if (parts[5] in lm.hf_transpose and w.ndim == 2) else w
                return True
        return False

    def _finalize_layers(self, layers) -> None:
        lm = self.linear_method
        for layer in layers:
            for key in self._LINEAR_KEYS:
                if key in layer and isinstance(layer[key], dict):
                    layer[key] = lm.convert_hf(layer[key])
            raw = layer.pop("_raw_experts", None)
            if raw is not None:
                layer["experts"] = {
                    "w_gate": np.stack(raw["gate_proj"]).transpose(
                        0, 2, 1).copy(),
                    "w_up": np.stack(raw["up_proj"]).transpose(
                        0, 2, 1).copy(),
                    "w_down": np.stack(raw["down_proj"]).transpose(
                        0, 2, 1).copy(),
                }

    def load_params(self, model_dir: str) -> Dict[str, Any]:
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
        params["layers"] = layers  # heterogeneous: kept as a list
        return cast_params_to(params, self.dtype)

    # --- forward ----------------------------------------------------------------
    def _ffn(self, lp, x):
        if "experts" in lp:
            logits = jnp.dot(x, lp["router"],
                             preferred_element_type=jnp.float32)
            weights, ids = topk_softmax(logits, self.top_k,
                                        renormalize=False)
            return fused_moe(x, lp["experts"]["w_gate"],
                             lp["experts"]["w_up"], lp["experts"]["w_down"],
                             weights, ids)
        lm = self.linear_method
        return lm.apply(lp["down"], silu_and_mul(lm.apply(lp["gate"], x),
                                                 lm.apply(lp["up"], x)))

    def _attn_layer(self, lp, x, k_cache, v_cache, meta, is_prefill,
                    layer_id=None):
        T = x.shape[0]
        lm = self.linear_method
        q = lm.apply(lp["q"], x).reshape(T, self.num_heads, self.head_dim)
        k = lm.apply(lp["k"], x).reshape(T, self.num_kv_heads, self.head_dim)
        v = lm.apply(lp["v"], x).reshape(T, self.num_kv_heads, self.head_dim)
        out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                   is_prefill=is_prefill,
                                   layer_id=layer_id,
                                   num_blocks=self._nb)
        return lm.apply(lp["o"],
                        out.reshape(T, self.num_heads * self.head_dim)), \
            new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        assert lora is None and mm is None  # text-only; LoRA later
        k_stack, v_stack, states = kv_caches
        La, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((La * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((La * nb, ) + v_stack.shape[2:])
        conv_all, ssm_all = states["conv"], states["ssm"]
        num_slots = conv_all.shape[1] - 1  # last row = scratch
        slots = meta.state_slots
        if is_prefill:
            slot = slots[0]
            # fresh prefill (chunk start at position 0) resets the slot
            fresh = positions[0] == 0
        x = self.embed_tokens(params, token_ids)
        ai = mi = 0
        for i, lp in enumerate(params["layers"]):
            res = x
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            if self.layer_is_attn[i]:
                h, (k_flat, v_flat) = self._attn_layer(
                    lp, h, k_flat, v_flat, meta, is_prefill,
                    jnp.int32(ai))
                ai += 1
            else:
                mp = lp["mamba"]
                if is_prefill:
                    cs = jnp.where(fresh, 0,
                                   conv_all[mi, jnp.clip(slot, 0,
                                                         num_slots)])
                    ss = jnp.where(fresh, 0,
                                   ssm_all[mi, jnp.clip(slot, 0,
                                                        num_slots)])
                    h, nc, ns = mamba_mixer_seq(
                        mp, h, cs, ss, d_state=self.d_state,
                        dt_rank=self.dt_rank, d_conv=self.d_conv,
                        eps=self.rms_eps)
                    conv_all = conv_all.at[mi, slot].set(nc, mode="drop")
                    ssm_all = ssm_all.at[mi, slot].set(ns, mode="drop")
                else:
                    cs = conv_all[mi, jnp.clip(slots, 0, num_slots)]
                    ss = ssm_all[mi, jnp.clip(slots, 0, num_slots)]
                    h, nc, ns = mamba_mixer_decode(
                        mp, h, cs, ss, d_state=self.d_state,
                        dt_rank=self.dt_rank, d_conv=self.d_conv,
                        eps=self.rms_eps)
                    conv_all = conv_all.at[mi, slots].set(nc, mode="drop")
                    ssm_all = ssm_all.at[mi, slots].set(ns, mode="drop")
                mi += 1
            x = res + h
            res = x
            h = rms_norm(x, lp["pre_ff_norm"], self.rms_eps)
            x = res + self._ffn(lp, h)
        final = rms_norm(x, params["final_norm"], self.rms_eps)
        return final, (k_flat.reshape(k_stack.shape),
                       v_flat.reshape(v_stack.shape),
                       {"conv": conv_all, "ssm": ssm_all})
