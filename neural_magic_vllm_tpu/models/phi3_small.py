"""Phi-3-Small (reference vllm/model_executor/models/phi3_small.py):
LayerNorm decoder with head-major fused query_key_value (rows grouped
[kvh, q_per_kv+2, hd], phi3_small.py:236-247), gegelu MLP with clamping
limit over interleaved [gelu, linear] channels (phi3_small.py:59-70), muP
scalings (attn scale mup_attn_multiplier/head_dim, embeddings x
mup_embedding_multiplier, logits / mup_width_multiplier), dummy-token
logit masking, and vertical-stride BLOCKSPARSE attention on all layers
except every dense_attention_every_n_layers-th (phi3_small.py:196-216).

TPU design: with dense_attention_every_n_layers=2 the (sparse, dense)
layer pairs run under one lax.scan over stride-sliced stacked params —
the alternation is static, so each sub-layer binds its own Attention
(blocksparse mask variant vs pallas dense) with zero per-step branching."""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.layers.attention import Attention
from neural_magic_vllm_tpu.layers.rotary import get_rope
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.gpt_family import (GPTFamilyForCausalLM,
                                                     _ln)


def gegelu(x: jax.Array, limit) -> jax.Array:
    """reference phi3_small.py:59-70: interleaved [gelu, linear] halves,
    clamped at limit; quick-gelu(a) * (b + 1)."""
    a = x[..., 0::2]
    b = x[..., 1::2]
    if limit is not None:
        a = jnp.minimum(a, limit)
        b = jnp.clip(b, -limit, limit)
    return a * jax.nn.sigmoid(1.702 * a) * (b + 1.0)


@register_model("Phi3SmallForCausalLM")
class Phi3SmallForCausalLM(GPTFamilyForCausalLM):
    norm_kind = "ln"
    tie_default = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        super().__init__(model_config, parallel_config, quant_config)
        self.gegelu_limit = getattr(cfg, "gegelu_limit", None)
        self.emb_mult = float(getattr(cfg, "mup_embedding_multiplier", 0)
                              or 0)
        self.width_mult = float(getattr(cfg, "mup_width_multiplier", 1.0)
                                or 1.0)
        self.dummy_tokens = tuple(getattr(cfg, "dummy_token_indices", ())
                                  or ())
        if getattr(cfg, "mup_use_scaling", True):
            scale = float(getattr(cfg, "mup_attn_multiplier",
                                  1.0)) / self.head_dim
        else:
            scale = self.head_dim**-0.5

        base = float(getattr(cfg, "rope_embedding_base", 10**6))
        pos_scale = float(getattr(cfg, "rope_position_scale", 1.0))
        scaling = getattr(cfg, "rope_scaling", None)
        if scaling is not None:
            scaling = {k: (tuple(v) if isinstance(v, list) else v)
                       for k, v in scaling.items()}
            scaling.setdefault("factor", pos_scale)
        elif pos_scale != 1.0:
            scaling = {"rope_type": "linear", "factor": pos_scale}
        self.rope = get_rope(self.head_dim, None, self.max_pos, base, True,
                             scaling)

        self.dense_every = int(
            getattr(cfg, "dense_attention_every_n_layers", 0) or 0)
        if self.dense_every not in (0, 1, 2):
            raise NotImplementedError(
                "dense_attention_every_n_layers > 2 not supported")
        if self.dense_every == 2 and self.num_layers % 2:
            raise NotImplementedError("odd layer count at dense_every=2")
        bs_params = (int(cfg.blocksparse_block_size),
                     int(cfg.blocksparse_num_local_blocks),
                     int(cfg.blocksparse_vert_stride),
                     bool(cfg.blocksparse_homo_head_pattern))
        self.attn_dense = Attention(self.num_heads, self.head_dim,
                                    self.num_kv_heads, scale=scale)
        self.attn_sparse = Attention(self.num_heads, self.head_dim,
                                     self.num_kv_heads, scale=scale,
                                     blocksparse=bs_params) \
            if self.dense_every != 1 else self.attn_dense
        if self.dense_every != 1:
            from neural_magic_vllm_tpu.logger import init_logger
            init_logger(__name__).info(
                "phi3_small blocksparse: decode and context prefill run "
                "chunk-skipping Pallas kernels; only the batched "
                "segment-prefill path uses the jnp mask fallback "
                "(reference kernel: backends/blocksparse_attn.py:410).")

    def _intermediate_size(self, cfg) -> int:
        return cfg.intermediate_size

    def _init_layer(self, rng):
        # fc1 (up_proj) emits 2*I interleaved gegelu channels
        lm = self.linear_method
        save = self.intermediate_size
        self.intermediate_size = 2 * save
        lp = super()._init_layer(rng)
        self.intermediate_size = save
        lp["fc2"] = lm.create_params(rng, save, self.hidden_size, True)
        return lp

    # --- loading ------------------------------------------------------------
    def _load_tensor(self, layers, params, name, w) -> bool:
        if name == "model.embed_tokens.weight":
            params["embed"] = w
        elif name == "lm_head.weight":
            params["lm_head"] = w.T.copy()
        elif name.startswith("model.final_layernorm."):
            self._ln_entry(params, "final_norm", name.split(".")[-1], w)
        elif name.startswith("model.layers."):
            parts = name.split(".")
            layer = layers[int(parts[2])]
            sub, kind = ".".join(parts[3:-1]), parts[-1]
            if sub == "input_layernorm":
                self._ln_entry(layer, "ln1", kind, w)
            elif sub == "post_attention_layernorm":
                self._ln_entry(layer, "ln2", kind, w)
            elif sub == "self_attn.query_key_value":
                layer.setdefault("_qkv", {})[kind] = w
            elif sub == "self_attn.dense":
                layer.setdefault("o", {})[kind] = \
                    w.T.copy() if w.ndim == 2 else w
            elif sub == "mlp.up_proj":
                layer.setdefault("fc1", {})[kind] = \
                    w.T.copy() if w.ndim == 2 else w
            elif sub == "mlp.down_proj":
                layer.setdefault("fc2", {})[kind] = \
                    w.T.copy() if w.ndim == 2 else w
            else:
                return False
        else:
            return False
        return True

    def _finalize_layers(self, layers: List[Dict]) -> None:
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        qpg = nh // kvh
        for layer in layers:
            raw = layer.pop("_qkv", None)
            if raw is None:
                continue
            for kind, w in raw.items():
                g = w.reshape(kvh, qpg + 2, hd, -1) if w.ndim == 2 else \
                    w.reshape(kvh, qpg + 2, hd)
                if w.ndim == 2:
                    H = w.shape[-1]
                    layer.setdefault("q", {})[kind] = np.ascontiguousarray(
                        g[:, :qpg].reshape(nh * hd, H).T)
                    layer.setdefault("k", {})[kind] = np.ascontiguousarray(
                        g[:, qpg].reshape(kvh * hd, H).T)
                    layer.setdefault("v", {})[kind] = np.ascontiguousarray(
                        g[:, qpg + 1].reshape(kvh * hd, H).T)
                else:
                    layer.setdefault("q", {})[kind] = np.ascontiguousarray(
                        g[:, :qpg].reshape(nh * hd))
                    layer.setdefault("k", {})[kind] = np.ascontiguousarray(
                        g[:, qpg].reshape(kvh * hd))
                    layer.setdefault("v", {})[kind] = np.ascontiguousarray(
                        g[:, qpg + 1].reshape(kvh * hd))
        super()._finalize_layers(layers)

    # --- forward ------------------------------------------------------------
    def embed_tokens(self, params, token_ids):
        x = super().embed_tokens(params, token_ids)
        if self.emb_mult > 0.0:
            x = x * jnp.asarray(self.emb_mult, x.dtype)
        return x

    def _mlp(self, lp, h):
        lm = self.linear_method
        return lm.apply(lp["fc2"],
                        gegelu(lm.apply(lp["fc1"], h), self.gegelu_limit))

    def _ps_layer(self, lp, res, rope_cos, rope_sin, k_cache, v_cache,
                  meta, is_prefill: bool, attn, layer_id):
        lm = self.linear_method
        T = res.shape[0]
        h = _ln(lp.get("ln1"), res, self.eps)
        q = lm.apply(lp["q"], h).reshape(T, self.num_heads, self.head_dim)
        k = lm.apply(lp["k"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        v = lm.apply(lp["v"], h).reshape(T, self.num_kv_heads,
                                         self.head_dim)
        q, k = self.rope.apply(rope_cos, rope_sin, q, k)
        attn_out, new_cache = attn(q, k, v, (k_cache, v_cache), meta,
                                   is_prefill=is_prefill,
                                   layer_id=layer_id, num_blocks=self._nb)
        res = res + lm.apply(
            lp["o"], attn_out.reshape(T, self.num_heads * self.head_dim))
        h2 = _ln(lp.get("ln2"), res, self.eps)
        return res + self._mlp(lp, h2), new_cache

    def forward(self, params, token_ids, positions, kv_caches, meta, *,
                is_prefill: bool, lora=None, lora_idx=None, mm=None):
        assert lora is None and mm is None
        k_stack, v_stack = kv_caches
        L, nb = k_stack.shape[0], k_stack.shape[1]
        self._nb = nb
        k_flat = k_stack.reshape((L * nb, ) + k_stack.shape[2:])
        v_flat = v_stack.reshape((L * nb, ) + v_stack.shape[2:])
        x = self.embed_tokens(params, token_ids)
        rope_cos, rope_sin = self.rope.precompute(positions)

        if self.dense_every != 2:
            attn = self.attn_sparse if self.dense_every == 0 else \
                self.attn_dense

            def body(carry, xs_):
                res, k_f, v_f = carry
                lp, lid = xs_
                res, (k_f, v_f) = self._ps_layer(lp, res, rope_cos,
                                                 rope_sin, k_f, v_f, meta,
                                                 is_prefill, attn, lid)
                return (res, k_f, v_f), None

            (x, k_flat, v_flat), _ = jax.lax.scan(
                body, (x, k_flat, v_flat),
                (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        else:
            # (sparse, dense) pairs: layer idx 2i sparse, 2i+1 dense
            # ((idx+1) % 2 == 0 -> dense, phi3_small.py:196-199)
            sp = jax.tree_util.tree_map(lambda a: a[0::2], params["layers"])
            dn = jax.tree_util.tree_map(lambda a: a[1::2], params["layers"])

            def pair_body(carry, xs_):
                res, k_f, v_f = carry
                slp, dlp, pair = xs_
                res, (k_f, v_f) = self._ps_layer(slp, res, rope_cos,
                                                 rope_sin, k_f, v_f, meta,
                                                 is_prefill,
                                                 self.attn_sparse,
                                                 2 * pair)
                res, (k_f, v_f) = self._ps_layer(dlp, res, rope_cos,
                                                 rope_sin, k_f, v_f, meta,
                                                 is_prefill,
                                                 self.attn_dense,
                                                 2 * pair + 1)
                return (res, k_f, v_f), None

            (x, k_flat, v_flat), _ = jax.lax.scan(
                pair_body, (x, k_flat, v_flat),
                (sp, dn, jnp.arange(L // 2, dtype=jnp.int32)))
        res = _ln(params.get("final_norm"), x, self.eps)
        return res, (k_flat.reshape(k_stack.shape),
                     v_flat.reshape(v_stack.shape))

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(hidden=hidden, params=params)
        logits = logits / jnp.asarray(self.width_mult, jnp.float32)
        if self.dummy_tokens:
            idx = jnp.asarray(self.dummy_tokens, jnp.int32)
            logits = logits.at[:, idx].set(float("-inf"))
        return logits
