"""Llama-family decoder (Llama 2/3, Mistral, TinyLlama).

Capability parity with the reference vllm/model_executor/models/llama.py,
re-designed for TPU:
- pure-functional forward over a param pytree; paged KV caches threaded
  through and donated.
- layers run under ``lax.scan`` over STACKED layer params (leading axis =
  layer), so XLA traces one layer regardless of depth — compile time stays
  flat where the reference re-captures CUDA graphs per shape.
- TP is PartitionSpecs on params (GSPMD inserts the all-reduces the
  reference codes by hand in RowParallelLinear, linear.py:690).
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
from neural_magic_vllm_tpu.layers.norm import rms_norm
from neural_magic_vllm_tpu.layers.rotary import get_rope
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.ops.kv_cache import KVCache


def stack_layer_params(layers: List[Dict[str, Any]]) -> Dict[str, Any]:
    """List of per-layer param dicts -> one dict of arrays with a leading
    layer axis (scan xs)."""
    out = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)
    return out


# Param names whose dtype is part of the quantized format and must survive
# the model-dtype cast (packed ints, scales, fp8/int8 weights keep their
# storage dtype by the float16/32/64-only cast rule below).
_CAST_DTYPES = ("float16", "float32", "float64")
_KEEP_DTYPE_NAMES = frozenset(
    {"qweight", "scales", "zeros", "input_perm", "weight_scale",
     "input_scale", "kv_scales", "lookup_table", "codes", "codebooks",
     "absmax"})


def cast_params_to(params, dtype):
    """Cast fp params to the model dtype, leaving quantized storage alone."""

    def cast(path, x):
        key = getattr(path[-1], "key", None) if path else None
        if key in _KEEP_DTYPE_NAMES:
            return jnp.asarray(x)
        if str(np.asarray(x).dtype) in _CAST_DTYPES:
            return jnp.asarray(x, dtype=dtype)
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(cast, params)


@register_model("LlamaForCausalLM", "LLaMAForCausalLM",
                "MistralForCausalLM")
class LlamaForCausalLM:
    """Functional model definition. Params are a plain pytree with
    params["layers"] holding layer-stacked arrays."""

    # Subclass knobs (qwen2 sets qkv_bias=True, gemma sets offsets/scale).
    qkv_bias = False
    tie_word_embeddings_default = False
    norm_weight_offset = 0.0
    scale_embeddings = False

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
        # Fused same-input linears (qkv, gate_up): 7 -> 4 kernel dispatches
        # per layer (reference MergedColumnParallel/QKVParallelLinear role,
        # linear.py:341,490; here the motive is per-dispatch overhead in
        # the decode step). Disabled per-method when params can't N-concat
        # (act-order, per-tensor scales), and by the runner for LoRA
        # (adapters address q/k/v/gate/up individually).
        import os as _os
        self.merged = bool(int(_os.getenv("NMV_TPU_MERGE_LINEARS", "1"))) \
            and all(getattr(type(self), m) is getattr(LlamaForCausalLM, m)
                    for m in ("_init_layer", "_layer", "_mlp",
                              "_finalize_layers", "_layer_specs",
                              "_load_into_layers"))
        self.attn = Attention(self.num_heads, self.head_dim,
                              self.num_kv_heads,
                              scale=self.head_dim**-0.5,
                              sliding_window=self.sliding_window)

    # --- params ---------------------------------------------------------------
    def _init_layer(self, rng: np.random.Generator) -> Dict[str, Any]:
        lm = self.linear_method
        H, I = self.hidden_size, self.intermediate_size
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        layer = {
            "input_norm": np.ones((H, ), np.float32),
            "post_norm": np.ones((H, ), np.float32),
            "q": lm.create_params(rng, H, nh * hd, self.qkv_bias),
            "k": lm.create_params(rng, H, kvh * hd, self.qkv_bias),
            "v": lm.create_params(rng, H, kvh * hd, self.qkv_bias),
            "o": lm.create_params(rng, nh * hd, H, False),
            "gate": lm.create_params(rng, H, I, False),
            "up": lm.create_params(rng, H, I, False),
            "down": lm.create_params(rng, I, H, False),
        }
        self._merge_layer(layer)
        return layer

    def _merge_layer(self, layer: Dict[str, Any]) -> None:
        """Fuse q/k/v -> qkv and gate/up -> gate_up in place when enabled
        and the linear method's params N-concat; flips self.merged off on
        the first unmergeable layer (act-order etc.)."""
        if not self.merged:
            return
        lm = self.linear_method
        qkv = lm.merge_params([layer["q"], layer["k"], layer["v"]])
        gate_up = lm.merge_params([layer["gate"], layer["up"]])
        if qkv is None or gate_up is None:
            self.merged = False
            return
        for k in ("q", "k", "v", "gate", "up"):
            del layer[k]
        layer["qkv"] = qkv
        layer["gate_up"] = gate_up

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Random init (DummyModelLoader analogue, loader.py:309).

        Built to be fast at 8B+ scale over a device tunnel: ONE layer is
        generated host-side (numpy) and tiled on device to all L layers
        (dummy weights need realistic magnitudes, not per-layer variety),
        and the large embed/lm_head matrices are generated on device."""
        H, V = self.hidden_size, self.vocab_size
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        nprng = np.random.default_rng(seed)
        layer = cast_params_to(self._init_layer(nprng), self.dtype)
        layers = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None],
                                       (self.num_layers, ) + x.shape).copy()
            if self.num_layers > 1 else x[None], layer)
        k_e, k_l = jax.random.split(jax.random.PRNGKey(seed))
        embed = (jax.random.normal(k_e, (V, H), dtype=jnp.float32) *
                 0.02).astype(self.dtype)
        params = {
            "embed": embed,
            "layers": layers,
            "final_norm": jnp.ones((H, ), self.dtype),
        }
        if not self.tie_embeddings:
            params["lm_head"] = (jax.random.normal(
                k_l, (H, V), dtype=jnp.float32) * 0.02).astype(self.dtype)
        else:
            params["lm_head"] = embed.T
        return params

    def _layer_specs(self) -> Dict[str, Any]:
        lm = self.linear_method
        specs = {
            "kv_scales": P(None),
            "input_norm": P(None),
            "post_norm": P(None),
            "o": lm.param_specs("row", False),
            "down": lm.param_specs("row", False),
        }
        if self.merged:
            specs["qkv"] = lm.param_specs("column", self.qkv_bias)
            specs["gate_up"] = lm.param_specs("column", False)
        else:
            specs.update({
                "q": lm.param_specs("column", self.qkv_bias),
                "k": lm.param_specs("column", self.qkv_bias),
                "v": lm.param_specs("column", self.qkv_bias),
                "gate": lm.param_specs("column", False),
                "up": lm.param_specs("column", False),
            })
        return specs

    def param_specs(self) -> Dict[str, Any]:
        """PartitionSpec tree parallel to params. Layer-stacked arrays get a
        leading None (layer) axis on each per-layer spec. TP over the
        "model" mesh axis: column-parallel q/k/v/gate/up, row-parallel
        o/down, vocab-sharded embedding/lm_head
        (reference linear.py:227,690; vocab_parallel_embedding.py:128)."""
        layer = jax.tree_util.tree_map(
            lambda s: P(None, *s), self._layer_specs(),
            is_leaf=lambda x: isinstance(x, P))
        return {
            "embed": P("model", None),
            "layers": layer,
            "final_norm": P(None),
            "lm_head": P(None, "model"),
        }

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

    def _load_into_layers(self, layers: List[Dict], name: str,
                          w: np.ndarray, params: Dict[str, Any]) -> bool:
        if name == "model.embed_tokens.weight":
            params["embed"] = w
        elif name == "model.norm.weight":
            params["final_norm"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("model.layers."):
            parts = name.split(".")
            idx = int(parts[2])
            sub = ".".join(parts[3:-1])
            kind = parts[-1]  # weight | bias
            layer = layers[idx]
            if sub == "input_layernorm":
                layer["input_norm"] = w
            elif sub == "post_attention_layernorm":
                layer["post_norm"] = w
            elif sub == "self_attn" and kind in ("kv_scale", "k_scale",
                                                "v_scale"):
                # FP8 KV-cache scales shipped in fp8 checkpoints
                # (reference llama.py:493-513 kv_scale remap)
                ks = layer.setdefault("kv_scales",
                                      np.ones((2, ), np.float32))
                val = float(np.asarray(w).reshape(()))
                if kind in ("kv_scale", "k_scale"):
                    ks[0] = val
                if kind in ("kv_scale", "v_scale"):
                    ks[1] = val
            elif sub in self._HF_LINEARS:
                lm = self.linear_method
                if kind not in lm.hf_param_names:
                    return False
                tgt = layer.setdefault(self._HF_LINEARS[sub], {})
                tgt[kind] = w.T.copy() \
                    if (kind in lm.hf_transpose and w.ndim == 2) else w
            else:
                return False
        else:
            return False
        return True

    # Linear sub-param keys within a layer dict (converted via the linear
    # method's convert_hf at finalize time; quantized methods unpack/repack
    # their checkpoint format here).
    _LINEAR_KEYS = ("q", "k", "v", "o", "gate", "up", "down")

    def _finalize_layers(self, layers: List[Dict]) -> None:
        """Post-load hook: convert each linear's raw HF tensors to device
        params (MoE models additionally stack expert tensors here), then
        fuse qkv / gate_up (all layers or none, so the layer stack stays
        uniform)."""
        lm = self.linear_method
        if any("kv_scales" in layer for layer in layers):
            for layer in layers:  # uniform keys for layer stacking
                layer.setdefault("kv_scales", np.ones((2, ), np.float32))
        for layer in layers:
            for key in self._LINEAR_KEYS:
                if key in layer and isinstance(layer[key], dict):
                    layer[key] = lm.convert_hf(layer[key])
        if self.merged:
            merged = [(lm.merge_params([l["q"], l["k"], l["v"]]),
                       lm.merge_params([l["gate"], l["up"]]))
                      for l in layers]
            if any(a is None or b is None for a, b in merged):
                self.merged = False  # e.g. act-order input perms
                return
            for layer, (qkv, gate_up) in zip(layers, merged):
                for k in ("q", "k", "v", "gate", "up"):
                    del layer[k]
                layer["qkv"] = qkv
                layer["gate_up"] = gate_up

    # merged-linear split points on the output axis (shared by every
    # mergeable param key: weight/qweight/scales/zeros/bias all carry N
    # as their last axis once layer-stacked)
    def _merge_splits(self, name: str) -> List[int]:
        if name == "qkv":
            nq = self.num_heads * self.head_dim
            nkv = self.num_kv_heads * self.head_dim
            return [nq, nq + nkv]
        return [self.intermediate_size]

    def adopt_state(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Reconcile a restored nmv_state tree with this instance's
        merged-linear setting (states saved by either variant load into
        the other: concat or split along the output axis)."""
        layers = params.get("layers")
        if not isinstance(layers, dict):
            return params
        has_merged = "qkv" in layers
        if any("input_perm" in layers.get(k, {}) for k in
               ("q", "k", "v", "gate", "up")):
            self.merged = False  # act-order states cannot merge
            return params
        lm = self.linear_method
        import numpy as _np

        def concat(parts):
            keys = set(parts[0])
            if any(set(p) != keys for p in parts):
                return None
            # same mergeability rule as LinearMethod.merge_params: keys
            # outside _MERGE_AXIS (per-tensor weight_scale, input_perm,
            # codebooks) make the shards non-concatenable — fp8's
            # per-shard scales would otherwise be blindly concatenated
            # into a [n_shards*L] array that breaks the layer scan
            if not keys.issubset(lm._MERGE_AXIS):
                return None
            # layer-stacked params carry N on the last axis for every
            # mergeable key (bias stacks to [L, N] too), so axis=-1 is
            # the stacked analogue of _MERGE_AXIS
            return {k: jnp.concatenate([p[k] for p in parts], axis=-1)
                    for k in keys}

        if self.merged and not has_merged:
            qkv = concat([layers["q"], layers["k"], layers["v"]])
            gate_up = concat([layers["gate"], layers["up"]])
            if qkv is None or gate_up is None:
                self.merged = False
                return params
            for k in ("q", "k", "v", "gate", "up"):
                del layers[k]
            layers["qkv"], layers["gate_up"] = qkv, gate_up
        elif not self.merged and has_merged:
            for name, outs in (("qkv", ("q", "k", "v")),
                               ("gate_up", ("gate", "up"))):
                merged = layers.pop(name)
                splits = self._merge_splits(name)
                for key, arr in merged.items():
                    pieces = jnp.split(arr, splits, axis=-1)
                    for out, piece in zip(outs, pieces):
                        layers.setdefault(out, {})[key] = piece
        return params

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
        params["layers"] = stack_layer_params(layers)
        return cast_params_to(params, self.dtype)

    # --- forward -----------------------------------------------------------------
    def embed_tokens(self, params, token_ids: jax.Array) -> jax.Array:
        x = jnp.take(params["embed"], token_ids, axis=0)
        if self.scale_embeddings:
            x = x * jnp.asarray(self.hidden_size**0.5, x.dtype)
        return x

    def _linear(self, lp, name: str, x, lora_ctx=None):
        """One named linear through the quant seam, plus the per-request
        LoRA delta when adapters are active (reference lora/layers.py
        WithLoRA wrappers; TPU batched-slot math in lora/layers.py)."""
        out = self.linear_method.apply(lp[name], x)
        if lora_ctx is not None:
            from neural_magic_vllm_tpu.lora.layers import apply_lora
            lora_l, lora_idx, scaling = lora_ctx
            out = out + apply_lora(x, lora_l["a"][name], lora_l["b"][name],
                                   scaling, lora_idx)
        return out

    def _mlp(self, lp, x, lora_ctx=None):
        if "gate_up" in lp:
            gu = self._linear(lp, "gate_up", x, lora_ctx)
            gate, up = jnp.split(gu, [self.intermediate_size], axis=-1)
        else:
            gate = self._linear(lp, "gate", x, lora_ctx)
            up = self._linear(lp, "up", x, lora_ctx)
        return self._linear(lp, "down", silu_and_mul(gate, up), lora_ctx)

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, lora_ctx=None, layer_id=None):
        off = self.norm_weight_offset
        T = res.shape[0]
        normed = rms_norm(res, lp["input_norm"], self.rms_eps, off)
        if "qkv" in lp:
            qkv = self._linear(lp, "qkv", normed, lora_ctx)
            nq = self.num_heads * self.head_dim
            nkv = self.num_kv_heads * self.head_dim
            q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
            q = q.reshape(T, self.num_heads, self.head_dim)
            k = k.reshape(T, self.num_kv_heads, self.head_dim)
            v = v.reshape(T, self.num_kv_heads, self.head_dim)
        else:
            q = self._linear(lp, "q", normed, lora_ctx).reshape(
                T, self.num_heads, self.head_dim)
            k = self._linear(lp, "k", normed, lora_ctx).reshape(
                T, self.num_kv_heads, self.head_dim)
            v = self._linear(lp, "v", normed, lora_ctx).reshape(
                T, self.num_kv_heads, self.head_dim)
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb,
                                        kv_scales=lp.get("kv_scales"))
        attn_out = self._linear(
            lp, "o", attn_out.reshape(T, self.num_heads * self.head_dim),
            lora_ctx)
        res = res + attn_out
        normed2 = rms_norm(res, lp["post_norm"], self.rms_eps, off)
        res = res + self._mlp(lp, normed2, lora_ctx)
        return res, new_cache

    def forward(
        self,
        params: Dict[str, Any],
        token_ids: jax.Array,  # [T]
        positions: jax.Array,  # [T]
        kv_caches: KVCache,  # (k_stack [L,nb,kvh,bs,hd], v_stack)
        meta: AttentionMetadata,
        *,
        is_prefill: bool,
        lora=None,  # {"a": {name: [L,S,in,r]}, "b": ..., "scaling": [S]}
        lora_idx=None,  # [T] int32 slot per token (0 = none)
        mm=None,  # (flat_embeds [P, H], idx [T] int32; -1 = text slot)
    ) -> Tuple[jax.Array, KVCache]:
        k_stack, v_stack = kv_caches
        x = self.embed_tokens(params, token_ids)
        if mm is not None:
            # Merge image-patch embeddings (multimodal prefill): gather the
            # per-slot patch row and select branch-free — the static-shape
            # analogue of the reference's merge_vision_embeddings scatter
            # (vllm/model_executor/models/llava.py).
            flat_embeds, mm_idx = mm
            img = jnp.take(flat_embeds, jnp.clip(mm_idx, 0), axis=0)
            x = jnp.where((mm_idx >= 0)[:, None], img.astype(x.dtype), x)
        pos = positions
        if lora is not None and "pos_scale" in lora:
            # long-context LoRA: per-request linear rope scaling by the
            # adapter's factor (reference LongContextLoRAContext,
            # lora/models.py:30; positions/factor == linear scaling)
            pos = positions.astype(jnp.float32) / jnp.take(
                lora["pos_scale"], lora_idx)
        rope_cos, rope_sin = self.rope.precompute(pos)

        # KV stacks ride the scan CARRY layer-flattened so the per-layer
        # scatter updates them IN PLACE (donated buffers, zero temp): the
        # previous xs->ys form double-buffered the whole cache every step.
        L, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((L * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((L * nb, ) + v_stack.shape[2:])

        layer_ids = jnp.arange(self.num_layers, dtype=jnp.int32)
        if lora is None:
            xs = (params["layers"], layer_ids)
        else:
            xs = (params["layers"], layer_ids, lora["a"], lora["b"])

        def body(carry, xs_):
            res, k_f, v_f = carry
            if lora is None:
                lp, lid = xs_
                lora_ctx = None
            else:
                lp, lid, la, lb = xs_
                lora_ctx = ({"a": la, "b": lb}, lora_idx, lora["scaling"])
            res, (k_f, v_f) = self._layer(lp, res, rope_cos, rope_sin,
                                          k_f, v_f, meta, is_prefill,
                                          lora_ctx, layer_id=lid)
            return (res, k_f, v_f), None

        (res, k_flat, v_flat), _ = jax.lax.scan(body, (x, k_flat, v_flat),
                                                xs)
        final = rms_norm(res, params["final_norm"], self.rms_eps,
                         self.norm_weight_offset)
        return final, (k_flat.reshape(k_stack.shape),
                       v_flat.reshape(v_stack.shape))

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        """[T, H] -> [T, V] fp32 (reference LogitsProcessor)."""
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
