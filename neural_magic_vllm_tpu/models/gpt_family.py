"""Non-llama decoder families: GPT-2, GPT-BigCode, OPT, GPT-NeoX, GPT-J,
Phi, StableLM, Starcoder2, OLMo.

Capability parity with the reference's per-file model zoo
(vllm/model_executor/models/{gpt2,gpt_bigcode,opt,gpt_neox,gpt_j,phi,
stablelm,starcoder2,olmo}.py), re-designed for TPU as ONE configurable
decoder: every family is a knob setting over the same scan-based
layer-stacked executor (positional scheme, norm kind, parallel vs
sequential block, gated vs 2-layer MLP, bias flags, rotary style) plus an
HF name map. All linears route through the LinearMethod quantization
seam; the paged Attention layer and KV machinery are shared with llama.
"""
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.activation import (gelu_fast, gelu_new,
                                                     silu_and_mul)
from neural_magic_vllm_tpu.layers.attention import Attention, \
    AttentionMetadata
from neural_magic_vllm_tpu.layers.linear import LinearMethod, \
    get_linear_method
from neural_magic_vllm_tpu.layers.rotary import get_rope
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import (cast_params_to,
                                                stack_layer_params)
from neural_magic_vllm_tpu.ops.kv_cache import KVCache

_ACTS = {
    "gelu_new": gelu_new,
    "gelu_pytorch_tanh": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def _ln(p: Optional[Dict[str, Any]], x: jax.Array,
        eps: float) -> jax.Array:
    """LayerNorm; p None -> non-parametric (OLMo), p w/o bias -> no shift."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        out = out * p["scale"]
        if "bias" in p:
            out = out + p["bias"]
    return out.astype(x.dtype)


class GPTFamilyForCausalLM:
    """Configurable decoder; subclasses set knobs + the HF name map."""

    # --- knobs (overridden per family) ---
    pos_scheme = "rope"  # "rope" | "learned" | "none"
    pos_offset = 0  # OPT stores positions at index pos+2
    parallel_block = False  # attn + mlp both from res (GPT-J/NeoX/Phi)
    single_ln = False  # parallel block shares ln1 (GPT-J/Phi)
    norm_kind = "ln"  # "ln" | "ln_nobias" | "nonparam"
    act_key = "gelu_new"
    mlp_gated = False  # StableLM/OLMo: silu(gate)*up
    attn_bias = True
    o_bias = True
    mlp_bias = True
    lm_head_bias = False
    tie_default = True
    neox_rotary = True
    logit_scale = 1.0
    embed_dtype_norm = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        self.cfg = cfg
        self.dtype = jnp.dtype(model_config.dtype)
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = self._num_kv_heads(cfg)
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.intermediate_size = self._intermediate_size(cfg)
        self.vocab_size = cfg.vocab_size
        self.max_pos = getattr(cfg, "max_position_embeddings", 2048)
        self.eps = self._norm_eps(cfg)
        self.tie_embeddings = getattr(cfg, "tie_word_embeddings",
                                      self.tie_default)
        self.linear_method: LinearMethod = get_linear_method(quant_config)
        self.act = _ACTS[self._act_name(cfg)]
        self.rope = None
        if self.pos_scheme == "rope":
            rd = self._rotary_dim(cfg)
            theta = getattr(cfg, "rope_theta", 10000.0)
            self.rope = get_rope(self.head_dim, rd, self.max_pos, theta,
                                 self.neox_rotary,
                                 getattr(cfg, "rope_scaling", None))
        self.attn = Attention(self.num_heads, self.head_dim,
                              self.num_kv_heads,
                              scale=self.head_dim**-0.5,
                              sliding_window=None)

    # --- per-family config hooks ---
    def _num_kv_heads(self, cfg) -> int:
        return getattr(cfg, "num_key_value_heads", None) \
            or cfg.num_attention_heads

    def _intermediate_size(self, cfg) -> int:
        for key in ("intermediate_size", "n_inner", "ffn_dim"):
            v = getattr(cfg, key, None)
            if v:
                return v
        return 4 * cfg.hidden_size

    def _norm_eps(self, cfg) -> float:
        for key in ("layer_norm_eps", "layer_norm_epsilon", "norm_eps",
                    "rms_norm_eps"):
            v = getattr(cfg, key, None)
            if v:
                return float(v)
        return 1e-5

    def _act_name(self, cfg) -> str:
        for key in ("hidden_act", "activation_function", "hidden_activation"):
            v = getattr(cfg, key, None)
            if v in _ACTS:
                return v
        return self.act_key

    def _rotary_dim(self, cfg) -> int:
        rd = getattr(cfg, "rotary_dim", None)
        if rd:
            return rd
        pct = getattr(cfg, "partial_rotary_factor", None) or \
            getattr(cfg, "rotary_pct", None)
        return int(self.head_dim * pct) if pct else self.head_dim

    # --- params ---------------------------------------------------------------
    def _norm_params(self) -> Optional[Dict[str, np.ndarray]]:
        H = self.hidden_size
        if self.norm_kind == "nonparam":
            return None
        p = {"scale": np.ones((H, ), np.float32)}
        if self.norm_kind == "ln":
            p["bias"] = np.zeros((H, ), np.float32)
        return p

    def _init_layer(self, rng: np.random.Generator) -> Dict[str, Any]:
        lm = self.linear_method
        H, I = self.hidden_size, self.intermediate_size
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        lp: Dict[str, Any] = {
            "q": lm.create_params(rng, H, nh * hd, self.attn_bias),
            "k": lm.create_params(rng, H, kvh * hd, self.attn_bias),
            "v": lm.create_params(rng, H, kvh * hd, self.attn_bias),
            "o": lm.create_params(rng, nh * hd, H, self.o_bias),
        }
        np_ = self._norm_params()
        if np_ is not None:
            lp["ln1"] = {k: v.copy() for k, v in np_.items()}
            if not (self.parallel_block and self.single_ln):
                lp["ln2"] = {k: v.copy() for k, v in np_.items()}
        if self.mlp_gated:
            lp["gate"] = lm.create_params(rng, H, I, self.mlp_bias)
            lp["up"] = lm.create_params(rng, H, I, self.mlp_bias)
            lp["down"] = lm.create_params(rng, I, H, self.mlp_bias)
        else:
            lp["fc1"] = lm.create_params(rng, H, I, self.mlp_bias)
            lp["fc2"] = lm.create_params(rng, I, H, self.mlp_bias)
        return lp

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        r = np.random.default_rng(seed)
        H, V = self.hidden_size, self.vocab_size
        layers = [self._init_layer(r) for _ in range(self.num_layers)]
        params: Dict[str, Any] = {
            "embed": (r.standard_normal((V, H)) * 0.02).astype(np.float32),
            "layers": stack_layer_params(layers),
        }
        fn = self._norm_params()
        if fn is not None:
            params["final_norm"] = fn
        if self.pos_scheme == "learned":
            params["pos_embed"] = (r.standard_normal(
                (self.max_pos + self.pos_offset, H)) * 0.02).astype(
                    np.float32)
        if self.tie_embeddings:
            params["lm_head"] = params["embed"].T.copy()
        else:
            params["lm_head"] = (r.standard_normal(
                (H, V)) * 0.02).astype(np.float32)
        if self.lm_head_bias:
            params["lm_head_bias"] = np.zeros((V, ), np.float32)
        return cast_params_to(params, self.dtype)

    def param_specs(self) -> Dict[str, Any]:
        lm = self.linear_method
        layer = {
            "q": lm.param_specs("column", self.attn_bias),
            "k": lm.param_specs("column", self.attn_bias),
            "v": lm.param_specs("column", self.attn_bias),
            "o": lm.param_specs("row", self.o_bias),
        }
        if self.mlp_gated:
            layer["gate"] = lm.param_specs("column", self.mlp_bias)
            layer["up"] = lm.param_specs("column", self.mlp_bias)
            layer["down"] = lm.param_specs("row", self.mlp_bias)
        else:
            layer["fc1"] = lm.param_specs("column", self.mlp_bias)
            layer["fc2"] = lm.param_specs("row", self.mlp_bias)
        layer = jax.tree_util.tree_map(
            lambda s: P(None, *s), layer,
            is_leaf=lambda x: isinstance(x, P))
        return {
            "embed": P("model", None),
            "layers": layer,
            "lm_head": P(None, "model"),
        }

    # --- HF loading (per-family; see subclasses) --------------------------------
    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {}
        layers: List[Dict] = [dict() for _ in range(self.num_layers)]
        for name, w in iterate_safetensors(model_dir):
            self._load_tensor(layers, params, name, w)
        self._finalize_layers(layers)
        if "lm_head" not in params:
            params["lm_head"] = np.ascontiguousarray(params["embed"].T)
        params["layers"] = stack_layer_params(layers)
        return cast_params_to(params, self.dtype)

    def _load_tensor(self, layers, params, name: str, w) -> bool:
        raise NotImplementedError

    def _finalize_layers(self, layers: List[Dict]) -> None:
        lm = self.linear_method
        for layer in layers:
            for key in ("q", "k", "v", "o", "fc1", "fc2", "gate", "up",
                        "down"):
                if key in layer and isinstance(layer[key], dict) and \
                        not isinstance(next(iter(layer[key].values()), None),
                                       dict):
                    layer[key] = lm.convert_hf(layer[key])

    @staticmethod
    def _ln_entry(layer_or_params, key, kind, w):
        tgt = layer_or_params.setdefault(key, {})
        tgt["scale" if kind == "weight" else "bias"] = w

    # --- forward ----------------------------------------------------------------
    def embed_tokens(self, params, token_ids: jax.Array) -> jax.Array:
        return jnp.take(params["embed"], token_ids, axis=0)

    def _mlp(self, lp, h):
        lm = self.linear_method
        if self.mlp_gated:
            return lm.apply(lp["down"],
                            silu_and_mul(lm.apply(lp["gate"], h),
                                         lm.apply(lp["up"], h)))
        return lm.apply(lp["fc2"], self.act(lm.apply(lp["fc1"], h)))

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, layer_id=None):
        lm = self.linear_method
        T = res.shape[0]
        h = _ln(lp.get("ln1"), res, self.eps)
        q = lm.apply(lp["q"], h).reshape(T, self.num_heads, self.head_dim)
        k = lm.apply(lp["k"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        v = lm.apply(lp["v"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        if self.rope is not None:
            q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb)
        o = lm.apply(lp["o"],
                     attn_out.reshape(T, self.num_heads * self.head_dim))
        if self.parallel_block:
            h2 = h if self.single_ln else _ln(lp.get("ln2"), res, self.eps)
            return res + o + self._mlp(lp, h2), new_cache
        res = res + o
        h2 = _ln(lp.get("ln2"), res, self.eps)
        return res + self._mlp(lp, h2), new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        assert lora is None and mm is None
        k_stack, v_stack = kv_caches
        x = self.embed_tokens(params, token_ids)
        if "embed_norm" in params:  # bloom word_embeddings_layernorm
            x = _ln(params["embed_norm"], x, self.eps)
        if self.pos_scheme == "learned":
            x = x + jnp.take(params["pos_embed"],
                             positions + self.pos_offset, axis=0)
        if self.rope is not None:
            rope_cos, rope_sin = self.rope.precompute(positions)
        else:
            rope_cos = rope_sin = jnp.zeros((token_ids.shape[0], 1),
                                            jnp.float32)

        L, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((L * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((L * nb, ) + v_stack.shape[2:])
        layer_ids = jnp.arange(L, dtype=jnp.int32)

        def body(carry, xs_):
            res, k_f, v_f = carry
            lp, lid = xs_
            res, (k_f, v_f) = self._layer(lp, res, rope_cos, rope_sin, k_f,
                                          v_f, meta, is_prefill,
                                          layer_id=lid)
            return (res, k_f, v_f), None

        (res, k_flat, v_flat), _ = jax.lax.scan(
            body, (x, k_flat, v_flat), (params["layers"], layer_ids))
        if "final_norm" in params or self.norm_kind == "nonparam":
            res = _ln(params.get("final_norm"), res, self.eps)
        return res, (k_flat.reshape(k_stack.shape),
                     v_flat.reshape(v_stack.shape))

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        if "lm_head_bias" in params:
            logits = logits + params["lm_head_bias"]
        if self.logit_scale != 1.0:
            logits = logits * self.logit_scale
        return logits


# =============================== GPT-2 =======================================
@register_model("GPT2LMHeadModel")
class GPT2LMHeadModel(GPTFamilyForCausalLM):
    """reference vllm/model_executor/models/gpt2.py. Conv1D checkpoints
    are already [in, out] — no transpose."""
    pos_scheme = "learned"
    norm_kind = "ln"
    act_key = "gelu_new"
    tie_default = True

    def _num_kv_heads(self, cfg):
        return cfg.num_attention_heads

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            params["embed"] = w
        elif name == "wpe.weight":
            params["pos_embed"] = w
        elif name.startswith("ln_f."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("h."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub in ("ln_1", "ln_2"):
                self._ln_entry(layer, "ln1" if sub == "ln_1" else "ln2",
                               kind, w)
            elif sub == "attn.c_attn":
                layer.setdefault("_c_attn", {})[kind] = w
            elif sub == "attn.c_proj":
                layer.setdefault("o", {})[kind] = w
            elif sub == "mlp.c_fc":
                layer.setdefault("fc1", {})[kind] = w
            elif sub == "mlp.c_proj":
                layer.setdefault("fc2", {})[kind] = w
            else:
                return False
        else:
            return False
        return True

    def _split_qkv(self, raw: Dict[str, np.ndarray]) -> Dict[str, Dict]:
        H = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        out = {}
        for tgt, sl in (("q", slice(0, H)), ("k", slice(H, H + kv)),
                        ("v", slice(H + kv, H + 2 * kv))):
            out[tgt] = {k: (v[:, sl] if v.ndim == 2 else v[sl]).copy()
                        for k, v in raw.items()}
        return out

    def _finalize_layers(self, layers):
        for layer in layers:
            raw = layer.pop("_c_attn", None)
            if raw is not None:
                layer.update(self._split_qkv(raw))
        super()._finalize_layers(layers)


# ============================ GPT-BigCode ====================================
@register_model("GPTBigCodeForCausalLM")
class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """reference gpt_bigcode.py: MQA (multi_query) starcoder-1 family;
    plain Linear checkpoints -> transpose."""

    def _num_kv_heads(self, cfg):
        return 1 if getattr(cfg, "multi_query", True) else \
            cfg.num_attention_heads

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.split(".")[-1] == "weight" and w.ndim == 2 and \
                not name.endswith(("wte.weight", "wpe.weight",
                                   "lm_head.weight")):
            w = w.T.copy()  # Linear [out, in] -> [in, out]
        return super()._load_tensor(layers, params, name, w)


# ================================ OPT ========================================
@register_model("OPTForCausalLM")
class OPTForCausalLM(GPTFamilyForCausalLM):
    """reference opt.py (do_layer_norm_before=True models)."""
    pos_scheme = "learned"
    pos_offset = 2
    act_key = "relu"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        cfg = self.cfg
        assert getattr(cfg, "word_embed_proj_dim",
                       cfg.hidden_size) == cfg.hidden_size, \
            "OPT project_in/out variants (350m) not supported"
        assert getattr(cfg, "do_layer_norm_before", True)

    def _num_kv_heads(self, cfg):
        return cfg.num_attention_heads

    _MAP = {
        "self_attn.q_proj": "q", "self_attn.k_proj": "k",
        "self_attn.v_proj": "v", "self_attn.out_proj": "o",
        "fc1": "fc1", "fc2": "fc2",
    }

    def _load_tensor(self, layers, params, name, w) -> bool:
        for pre in ("model.decoder.", "decoder."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        if name == "embed_tokens.weight":
            params["embed"] = w
        elif name == "embed_positions.weight":
            params["pos_embed"] = w
        elif name.startswith("final_layer_norm."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "self_attn_layer_norm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "final_layer_norm":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub in self._MAP:
                tgt = layer.setdefault(self._MAP[sub], {})
                tgt[kind] = w.T.copy() if kind == "weight" and \
                    w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True


# ============================== GPT-NeoX =====================================
@register_model("GPTNeoXForCausalLM")
class GPTNeoXForCausalLM(GPTFamilyForCausalLM):
    """reference gpt_neox.py: fused head-interleaved QKV, partial rotary,
    optional parallel residual (pythia family)."""
    act_key = "gelu"
    tie_default = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        self.parallel_block = bool(getattr(
            model_config.hf_text_config, "use_parallel_residual", True))
        super().__init__(model_config, parallel_config, quant_config)

    def _num_kv_heads(self, cfg):
        return cfg.num_attention_heads

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("gpt_neox."):
            name = name[len("gpt_neox."):]
        if name == "embed_in.weight":
            params["embed"] = w
        elif name == "embed_out.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("final_layer_norm."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "input_layernorm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "post_attention_layernorm":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub == "attention.query_key_value":
                layer.setdefault("_qkv", {})[kind] = w
            elif sub == "attention.dense":
                layer.setdefault("o", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_h_to_4h":
                layer.setdefault("fc1", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_4h_to_h":
                layer.setdefault("fc2", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers):
        nh, hd, H = self.num_heads, self.head_dim, self.hidden_size
        for layer in layers:
            raw = layer.pop("_qkv", None)
            if raw is not None:
                # [3H, H] head-interleaved: rows = (head, {q,k,v}, hd)
                w = raw["weight"].reshape(nh, 3, hd, H)
                b = raw.get("bias")
                if b is not None:
                    b = b.reshape(nh, 3, hd)
                for j, tgt in enumerate(("q", "k", "v")):
                    d = {"weight": np.ascontiguousarray(
                        w[:, j].reshape(nh * hd, H).T)}
                    if b is not None:
                        d["bias"] = np.ascontiguousarray(
                            b[:, j].reshape(nh * hd))
                    layer[tgt] = d
        super()._finalize_layers(layers)


# =============================== GPT-J =======================================
@register_model("GPTJForCausalLM")
class GPTJForCausalLM(GPTFamilyForCausalLM):
    """reference gpt_j.py: parallel single-ln block, GPT-J interleaved
    rotary over rotary_dim, biased lm_head."""
    parallel_block = True
    single_ln = True
    attn_bias = False
    o_bias = False
    act_key = "gelu_new"
    tie_default = False
    lm_head_bias = True
    neox_rotary = False

    def _num_kv_heads(self, cfg):
        return cfg.num_attention_heads

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name == "lm_head.bias":
            params["lm_head_bias"] = w
        elif name.startswith("ln_f."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("h."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            m = {"attn.q_proj": "q", "attn.k_proj": "k",
                 "attn.v_proj": "v", "attn.out_proj": "o",
                 "mlp.fc_in": "fc1", "mlp.fc_out": "fc2"}
            if sub == "ln_1":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub in m:
                layer.setdefault(m[sub], {})[kind] = \
                    w.T.copy() if kind == "weight" and w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True


# ================================ Phi ========================================
@register_model("PhiForCausalLM")
class PhiForCausalLM(GPTFamilyForCausalLM):
    """reference phi.py (phi-1/1.5/2): parallel single-ln block, partial
    neox rotary, biased everything, untied biased lm_head."""
    parallel_block = True
    single_ln = True
    act_key = "gelu_new"
    tie_default = False
    lm_head_bias = True

    _MAP = {
        "self_attn.q_proj": "q", "self_attn.k_proj": "k",
        "self_attn.v_proj": "v", "self_attn.dense": "o",
        "mlp.fc1": "fc1", "mlp.fc2": "fc2",
    }

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "embed_tokens.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name == "lm_head.bias":
            params["lm_head_bias"] = w
        elif name.startswith("final_layernorm."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "input_layernorm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub in self._MAP:
                layer.setdefault(self._MAP[sub], {})[kind] = \
                    w.T.copy() if kind == "weight" and w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True


# ============================== StableLM =====================================
@register_model("StableLmForCausalLM", "StableLMEpochForCausalLM")
class StableLmForCausalLM(GPTFamilyForCausalLM):
    """reference stablelm.py: llama-shaped but LayerNorm + partial rotary;
    gated silu MLP; optional qkv bias."""
    mlp_gated = True
    o_bias = False
    mlp_bias = False
    act_key = "silu"
    tie_default = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        self.attn_bias = bool(getattr(cfg, "use_qkv_bias", False))
        super().__init__(model_config, parallel_config, quant_config)

    _MAP = {
        "self_attn.q_proj": "q", "self_attn.k_proj": "k",
        "self_attn.v_proj": "v", "self_attn.o_proj": "o",
        "mlp.gate_proj": "gate", "mlp.up_proj": "up",
        "mlp.down_proj": "down",
    }

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "embed_tokens.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("norm."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "input_layernorm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "post_attention_layernorm":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub in self._MAP:
                layer.setdefault(self._MAP[sub], {})[kind] = \
                    w.T.copy() if kind == "weight" and w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True


# ============================= Starcoder2 ====================================
@register_model("Starcoder2ForCausalLM")
class Starcoder2ForCausalLM(StableLmForCausalLM):
    """reference starcoder2.py: GQA + full rope + biases + c_fc/c_proj
    gelu MLP + LayerNorm."""
    mlp_gated = False
    act_key = "gelu_pytorch_tanh"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        bias = bool(getattr(cfg, "use_bias", True))
        self.attn_bias = bias
        self.o_bias = bias
        self.mlp_bias = bias
        GPTFamilyForCausalLM.__init__(self, model_config, parallel_config,
                                      quant_config)

    _MAP = {
        "self_attn.q_proj": "q", "self_attn.k_proj": "k",
        "self_attn.v_proj": "v", "self_attn.o_proj": "o",
        "mlp.c_fc": "fc1", "mlp.c_proj": "fc2",
    }


# ================================ OLMo =======================================
@register_model("OlmoForCausalLM")
class OlmoForCausalLM(StableLmForCausalLM):
    """reference olmo.py: non-parametric LayerNorm, gated silu MLP,
    no biases."""
    norm_kind = "nonparam"
    mlp_gated = True
    act_key = "silu"
    tie_default = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        self.attn_bias = False
        GPTFamilyForCausalLM.__init__(self, model_config, parallel_config,
                                      quant_config)


# =============================== Cohere ======================================
@register_model("CohereForCausalLM")
class CohereForCausalLM(GPTFamilyForCausalLM):
    """reference commandr.py: parallel single-ln block, bias-free LayerNorm,
    gated silu MLP, interleaved (gptj-style) rotary, tied embeddings with
    logit_scale; optional per-head q/k layernorm (use_qk_norm)."""
    parallel_block = True
    single_ln = True
    norm_kind = "ln_nobias"
    mlp_gated = True
    attn_bias = False
    o_bias = False
    mlp_bias = False
    act_key = "silu"
    tie_default = True
    neox_rotary = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        self.logit_scale = float(getattr(self.cfg, "logit_scale", 1.0))
        self.use_qk_norm = bool(getattr(self.cfg, "use_qk_norm", False))

    def _norm_params(self):
        return {"scale": np.ones((self.hidden_size, ), np.float32)}

    def _init_layer(self, rng):
        lp = super()._init_layer(rng)
        if self.use_qk_norm:
            lp["q_norm"] = np.ones((self.num_heads, self.head_dim),
                                   np.float32)
            lp["k_norm"] = np.ones((self.num_kv_heads, self.head_dim),
                                   np.float32)
        return lp

    _MAP = {
        "self_attn.q_proj": "q", "self_attn.k_proj": "k",
        "self_attn.v_proj": "v", "self_attn.o_proj": "o",
        "mlp.gate_proj": "gate", "mlp.up_proj": "up",
        "mlp.down_proj": "down",
    }

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "embed_tokens.weight":
            params["embed"] = w
        elif name == "norm.weight":
            params["final_norm"] = {"scale": w}
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "input_layernorm":
                layer["ln1"] = {"scale": w}
            elif sub == "self_attn.q_norm":
                layer["q_norm"] = w.reshape(self.num_heads, self.head_dim)
            elif sub == "self_attn.k_norm":
                layer["k_norm"] = w.reshape(self.num_kv_heads,
                                            self.head_dim)
            elif sub in self._MAP:
                layer.setdefault(self._MAP[sub], {})[kind] = \
                    w.T.copy() if kind == "weight" and w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, layer_id=None):
        lm = self.linear_method
        T = res.shape[0]
        h = _ln(lp.get("ln1"), res, self.eps)
        q = lm.apply(lp["q"], h).reshape(T, self.num_heads, self.head_dim)
        k = lm.apply(lp["k"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        v = lm.apply(lp["v"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        if self.use_qk_norm:
            # per-head LayerNorm over head_dim, no bias (HF CohereLayerNorm)
            def hd_ln(x, scale):
                xf = x.astype(jnp.float32)
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
                return ((xf - mu) * jax.lax.rsqrt(var + self.eps) *
                        scale).astype(x.dtype)

            q = hd_ln(q, lp["q_norm"])
            k = hd_ln(k, lp["k_norm"])
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb)
        o = lm.apply(lp["o"],
                     attn_out.reshape(T, self.num_heads * self.head_dim))
        return res + o + self._mlp(lp, h), new_cache


# =============================== Falcon ======================================
@register_model("FalconForCausalLM", "RWForCausalLM")
class FalconForCausalLM(GPTFamilyForCausalLM):
    """reference falcon.py: fused group-interleaved QKV; 7B = parallel
    single-ln MQA, 40B+ (new_decoder_architecture) = parallel dual-ln GQA.
    Rotary models only (ALiBi falcon variants land with bloom/mpt)."""
    parallel_block = True
    attn_bias = False
    o_bias = False
    mlp_bias = False
    act_key = "gelu"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        self.new_arch = bool(getattr(cfg, "new_decoder_architecture",
                                     False))
        self.single_ln = not self.new_arch
        self.use_alibi = bool(getattr(cfg, "alibi", False))
        if self.use_alibi:
            self.pos_scheme = "none"
        if getattr(cfg, "bias", False):
            self.attn_bias = self.o_bias = self.mlp_bias = True
        if not self.new_arch and not getattr(cfg, "parallel_attn", True):
            self.parallel_block = False
        super().__init__(model_config, parallel_config, quant_config)
        if self.use_alibi:
            from neural_magic_vllm_tpu.ops.attention import \
                get_alibi_slopes
            # falcon adds alibi BEFORE the 1/sqrt(hd) normalization
            # (modeling_falcon: attention_logits *= inv_norm AFTER + alibi),
            # so the effective slope carries the norm factor.
            slopes = tuple(s * self.head_dim**-0.5
                           for s in get_alibi_slopes(self.num_heads))
            self.attn = Attention(
                self.num_heads, self.head_dim, self.num_kv_heads,
                scale=self.head_dim**-0.5, alibi_slopes=slopes)

    def _num_kv_heads(self, cfg) -> int:
        if getattr(cfg, "new_decoder_architecture", False):
            return getattr(cfg, "num_kv_heads", None) or \
                cfg.num_attention_heads
        if getattr(cfg, "multi_query", True):
            return 1
        return cfg.num_attention_heads

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "word_embeddings.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("ln_f."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("h."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub in ("input_layernorm", "ln_attn"):
                self._ln_entry(layer, "ln1", kind, w)
            elif sub in ("post_attention_layernorm", "ln_mlp"):
                self._ln_entry(layer, "ln2", kind, w)
            elif sub == "self_attention.query_key_value":
                layer.setdefault("_qkv", {})[kind] = w
            elif sub == "self_attention.dense":
                layer.setdefault("o", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_h_to_4h":
                layer.setdefault("fc1", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_4h_to_h":
                layer.setdefault("fc2", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers):
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        qpg = nh // kvh
        for layer in layers:
            raw = layer.pop("_qkv", None)
            if raw is None:
                continue
            # fused rows grouped per kv group: [kvh, qpg + 2, hd]
            w = raw["weight"].reshape(kvh, qpg + 2, hd, -1)
            H = w.shape[-1]
            layer["q"] = {"weight": np.ascontiguousarray(
                w[:, :qpg].reshape(nh * hd, H).T)}
            layer["k"] = {"weight": np.ascontiguousarray(
                w[:, qpg].reshape(kvh * hd, H).T)}
            layer["v"] = {"weight": np.ascontiguousarray(
                w[:, qpg + 1].reshape(kvh * hd, H).T)}
        super()._finalize_layers(layers)


# =============================== BLOOM =======================================
@register_model("BloomForCausalLM")
class BloomForCausalLM(GPTFamilyForCausalLM):
    """reference bloom.py: ALiBi positions (no rope/learned), embedding
    LayerNorm, head-interleaved fused QKV, sequential block."""
    pos_scheme = "none"
    act_key = "gelu"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        from neural_magic_vllm_tpu.ops.attention import get_alibi_slopes
        self.attn = Attention(self.num_heads, self.head_dim,
                              self.num_kv_heads,
                              scale=self.head_dim**-0.5,
                              alibi_slopes=get_alibi_slopes(self.num_heads))

    def _num_kv_heads(self, cfg):
        return cfg.num_attention_heads

    def init_params(self, rng):
        params = super().init_params(rng)
        params["embed_norm"] = cast_params_to(self._norm_params(),
                                              self.dtype)
        return params

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "word_embeddings.weight":
            params["embed"] = w
        elif name.startswith("word_embeddings_layernorm."):
            self._ln_entry(params, "embed_norm", name.split(".")[-1], w)
        elif name.startswith("ln_f."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("h."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "input_layernorm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "post_attention_layernorm":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub == "self_attention.query_key_value":
                layer.setdefault("_qkv", {})[kind] = w
            elif sub == "self_attention.dense":
                layer.setdefault("o", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_h_to_4h":
                layer.setdefault("fc1", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "mlp.dense_4h_to_h":
                layer.setdefault("fc2", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers):
        nh, hd = self.num_heads, self.head_dim
        for layer in layers:
            raw = layer.pop("_qkv", None)
            if raw is not None:
                w = raw["weight"].reshape(nh, 3, hd, -1)
                H = w.shape[-1]
                b = raw.get("bias")
                if b is not None:
                    b = b.reshape(nh, 3, hd)
                for j, tgt in enumerate(("q", "k", "v")):
                    d = {"weight": np.ascontiguousarray(
                        w[:, j].reshape(nh * hd, H).T)}
                    if b is not None:
                        d["bias"] = np.ascontiguousarray(
                            b[:, j].reshape(nh * hd))
                    layer[tgt] = d
        super()._finalize_layers(layers)


# ================================ MPT ========================================
@register_model("MptForCausalLM", "MPTForCausalLM")
class MptForCausalLM(GPTFamilyForCausalLM):
    """reference mpt.py: ALiBi, flat fused Wqkv (optionally kv-grouped),
    bias-free LayerNorm when no_bias, optional qkv clamp (clip_qkv)."""
    pos_scheme = "none"
    act_key = "gelu"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        attn_cfg = getattr(cfg, "attn_config", None)
        get = (attn_cfg.get if isinstance(attn_cfg, dict)
               else lambda k, d=None: getattr(attn_cfg, k, d)) \
            if attn_cfg is not None else (lambda k, d=None: d)
        no_bias = bool(getattr(cfg, "no_bias", True))
        self.norm_kind = "ln_nobias" if no_bias else "ln"
        self.attn_bias = not no_bias
        self.o_bias = not no_bias
        self.mlp_bias = not no_bias
        self.clip_qkv = get("clip_qkv")
        if get("qk_ln", False):
            raise NotImplementedError("MPT qk_ln")
        self._kv_heads = get("kv_n_heads") or cfg.num_attention_heads
        super().__init__(model_config, parallel_config, quant_config)
        if get("alibi", True):
            from neural_magic_vllm_tpu.ops.attention import \
                get_alibi_slopes
            self.attn = Attention(
                self.num_heads, self.head_dim, self.num_kv_heads,
                scale=self.head_dim**-0.5,
                alibi_slopes=get_alibi_slopes(self.num_heads))

    def _num_kv_heads(self, cfg):
        return self._kv_heads

    def _intermediate_size(self, cfg):
        return int(getattr(cfg, "expansion_ratio", 4) * cfg.hidden_size)

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            params["embed"] = w
        elif name.startswith("norm_f."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("blocks."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            sub, kind = ".".join(parts[2:-1]), parts[-1]
            if sub == "norm_1":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "norm_2":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub == "attn.Wqkv":
                layer.setdefault("_qkv", {})[kind] = w
            elif sub == "attn.out_proj":
                layer.setdefault("o", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "ffn.up_proj":
                layer.setdefault("fc1", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            elif sub == "ffn.down_proj":
                layer.setdefault("fc2", {})[kind] = \
                    w.T.copy() if kind == "weight" else w
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers):
        H = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        for layer in layers:
            raw = layer.pop("_qkv", None)
            if raw is None:
                continue
            for tgt, sl in (("q", slice(0, H)), ("k", slice(H, H + kv)),
                            ("v", slice(H + kv, H + 2 * kv))):
                layer[tgt] = {
                    k: np.ascontiguousarray(v[sl].T if v.ndim == 2
                                            else v[sl])
                    for k, v in raw.items()
                }
        super()._finalize_layers(layers)

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, layer_id=None):
        if self.clip_qkv is None:
            return super()._layer(lp, res, rope_cos, rope_sin, k_cache,
                                  v_cache, meta, is_prefill)
        lm = self.linear_method
        T = res.shape[0]
        h = _ln(lp.get("ln1"), res, self.eps)
        c = float(self.clip_qkv)
        q = jnp.clip(lm.apply(lp["q"], h), -c, c).reshape(
            T, self.num_heads, self.head_dim)
        k = jnp.clip(lm.apply(lp["k"], h), -c, c).reshape(
            T, self.num_kv_heads, self.head_dim)
        v = jnp.clip(lm.apply(lp["v"], h), -c, c).reshape(
            T, self.num_kv_heads, self.head_dim)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb)
        o = lm.apply(lp["o"],
                     attn_out.reshape(T, self.num_heads * self.head_dim))
        res = res + o
        h2 = _ln(lp.get("ln2"), res, self.eps)
        return res + self._mlp(lp, h2), new_cache


# ================================ JAIS =======================================
@register_model("JAISLMHeadModel")
class JAISLMHeadModel(GPT2LMHeadModel):
    """reference jais.py: GPT-2 layout with ALiBi positions (learned as a
    config fallback), muP scalings — embeddings x embeddings_scale
    (jais.py:230-253), logits x width_scale|mup_output_alpha*mup_width_scale
    (jais.py:277-283), attention scale 1/d when scale_qk_dot_by_d
    (jais.py:84-87) — and a swiglu MLP where c_fc2 gates c_fc
    (SwiGLUActivation, jais.py:47-49,161-165)."""

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        self.mlp_gated = getattr(cfg, "activation_function",
                                 "swiglu") == "swiglu"
        super().__init__(model_config, parallel_config, quant_config)
        self.emb_scale = float(
            getattr(cfg, "embeddings_scale", None)
            or getattr(cfg, "mup_embeddings_scale", 1.0))
        self.logit_scale = float(
            getattr(cfg, "width_scale", None)
            or (getattr(cfg, "mup_output_alpha", 1.0) *
                getattr(cfg, "mup_width_scale", 1.0)))
        by_d = bool(getattr(cfg, "scale_qk_dot_by_d", None)
                    or getattr(cfg, "mup_scale_qk_dot_by_d", False))
        scale = self.head_dim**(-1.0 if by_d else -0.5)
        if getattr(cfg, "position_embedding_type", "alibi") == "alibi":
            self.pos_scheme = "none"
            from neural_magic_vllm_tpu.ops.attention import \
                get_alibi_slopes
            self.attn = Attention(
                self.num_heads, self.head_dim, self.num_kv_heads,
                scale=scale, alibi_slopes=get_alibi_slopes(self.num_heads))
        else:
            self.attn = Attention(self.num_heads, self.head_dim,
                                  self.num_kv_heads, scale=scale)

    def embed_tokens(self, params, token_ids):
        x = super().embed_tokens(params, token_ids)
        return x * jnp.asarray(self.emb_scale, x.dtype)

    def _load_tensor(self, layers, params, name, w) -> bool:
        if "relative_pe" in name:
            return True
        # swiglu halves: c_fc2 gates (silu side), c_fc is the up half
        if ".mlp.c_fc2." in name:
            name = name.replace(".mlp.c_fc2.", ".mlp.@gate.")
        elif self.mlp_gated and ".mlp.c_proj." in name:
            name = name.replace(".mlp.c_proj.", ".mlp.@down.")
        elif self.mlp_gated and ".mlp.c_fc." in name:
            name = name.replace(".mlp.c_fc.", ".mlp.@up.")
        if ".mlp.@" in name:
            parts = name.split(".")
            layer = layers[int(parts[2 if parts[0] == "transformer"
                                     else 1])]
            key = parts[-2][1:]
            layer.setdefault(key, {})[parts[-1]] = w
            return True
        return super()._load_tensor(layers, params, name, w)


# ================================ DBRX =======================================
@register_model("DbrxForCausalLM")
class DbrxForCausalLM(GPTFamilyForCausalLM):
    """reference dbrx.py: GQA with clamped fused Wqkv, bias-free
    LayerNorm, 16-expert GLU MoE with L1-renormalized top-k routing,
    fused expert tensors [E*ffn, H]."""
    norm_kind = "ln_nobias"
    attn_bias = False
    o_bias = False
    tie_default = False

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        attn_cfg = cfg.attn_config
        ffn_cfg = cfg.ffn_config
        self._kv_heads = getattr(attn_cfg, "kv_n_heads", None) or \
            cfg.num_attention_heads
        self._ffn_hidden = ffn_cfg.ffn_hidden_size
        self.num_experts = ffn_cfg.moe_num_experts
        self.top_k = ffn_cfg.moe_top_k
        self.clip_qkv = getattr(attn_cfg, "clip_qkv", None)
        super().__init__(model_config, parallel_config, quant_config)
        theta = getattr(attn_cfg, "rope_theta", None)
        if theta:
            self.rope = get_rope(self.head_dim, None, self.max_pos,
                                 float(theta), True, None)

    def _num_kv_heads(self, cfg):
        return self._kv_heads

    def _intermediate_size(self, cfg):
        return self._ffn_hidden

    def _init_layer(self, rng):
        lm = self.linear_method
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        scale = 1.0 / np.sqrt(H)
        lp = {
            "q": lm.create_params(rng, H, nh * hd, False),
            "k": lm.create_params(rng, H, kvh * hd, False),
            "v": lm.create_params(rng, H, kvh * hd, False),
            "o": lm.create_params(rng, nh * hd, H, False),
            "ln1": self._norm_params(),
            "ln2": self._norm_params(),
            "router": rng.uniform(-scale, scale, (H, E)).astype(np.float32),
            "experts": {
                "w_gate": rng.uniform(-scale, scale,
                                      (E, H, I)).astype(np.float32),
                "w_up": rng.uniform(-scale, scale,
                                    (E, H, I)).astype(np.float32),
                "w_down": rng.uniform(-scale, scale,
                                      (E, I, H)).astype(np.float32),
            },
        }
        return lp

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["experts"] = {
            "w_gate": P(None, None, None, "model"),
            "w_up": P(None, None, None, "model"),
            "w_down": P(None, None, "model", None),
        }
        specs["layers"].pop("fc1", None)
        specs["layers"].pop("fc2", None)
        return specs

    def _load_tensor(self, layers, params, name, w) -> bool:
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name == "norm_f.weight":
            params["final_norm"] = {"scale": w}
        elif name.startswith("blocks."):
            parts = name.split(".")
            layer = layers[int(parts[1])]
            rest = ".".join(parts[2:])
            if rest == "norm_attn_norm.norm_1.weight":
                layer["ln1"] = {"scale": w}
            elif rest == "norm_attn_norm.norm_2.weight":
                layer["ln2"] = {"scale": w}
            elif rest == "norm_attn_norm.attn.Wqkv.weight":
                layer["_wqkv"] = w
            elif rest == "norm_attn_norm.attn.out_proj.weight":
                layer["o"] = {"weight": w.T.copy()}
            elif rest == "ffn.router.layer.weight":
                layer["router"] = w.T.copy()
            elif rest in ("ffn.experts.mlp.w1", "ffn.experts.mlp.v1",
                          "ffn.experts.mlp.w2"):
                E, I, H = self.num_experts, self.intermediate_size, \
                    self.hidden_size
                chunks = w.reshape(E, I, H)
                key = rest.rsplit(".", 1)[-1]
                if key == "w1":  # gate: chunk [I, H] -> [H, I]
                    layer.setdefault("experts", {})["w_gate"] = \
                        np.ascontiguousarray(chunks.transpose(0, 2, 1))
                elif key == "v1":
                    layer.setdefault("experts", {})["w_up"] = \
                        np.ascontiguousarray(chunks.transpose(0, 2, 1))
                else:  # w2: chunk [I, H] already down-proj in-first
                    layer.setdefault("experts", {})["w_down"] = \
                        np.ascontiguousarray(chunks)
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers):
        H = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        for layer in layers:
            raw = layer.pop("_wqkv", None)
            if raw is not None:
                for tgt, sl in (("q", slice(0, H)),
                                ("k", slice(H, H + kv)),
                                ("v", slice(H + kv, H + 2 * kv))):
                    layer[tgt] = {"weight": np.ascontiguousarray(raw[sl].T)}
        super()._finalize_layers(layers)

    def _mlp(self, lp, h):
        from neural_magic_vllm_tpu.ops.moe import fused_moe, topk_softmax
        logits = jnp.dot(h, lp["router"],
                         preferred_element_type=jnp.float32)
        weights, ids = topk_softmax(logits, self.top_k, renormalize=True)
        return fused_moe(h, lp["experts"]["w_gate"], lp["experts"]["w_up"],
                         lp["experts"]["w_down"], weights, ids)

    def _layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache, meta,
               is_prefill: bool, layer_id=None):
        lm = self.linear_method
        T = res.shape[0]
        h = _ln(lp.get("ln1"), res, self.eps)
        c = self.clip_qkv

        def clip(x):
            return jnp.clip(x, -float(c), float(c)) if c else x

        q = clip(lm.apply(lp["q"], h)).reshape(T, self.num_heads,
                                               self.head_dim)
        k = clip(lm.apply(lp["k"], h)).reshape(T, self.num_kv_heads,
                                               self.head_dim)
        v = clip(lm.apply(lp["v"], h)).reshape(T, self.num_kv_heads,
                                               self.head_dim)
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = self.attn(q, k, v, (k_cache, v_cache), meta,
                                        is_prefill=is_prefill,
                                        layer_id=layer_id,
                                        num_blocks=self._nb)
        res = res + lm.apply(
            lp["o"], attn_out.reshape(T, self.num_heads * self.head_dim))
        h2 = _ln(lp.get("ln2"), res, self.eps)
        return res + self._mlp(lp, h2), new_cache
