"""CLIP vision tower (functional JAX), the image encoder behind the
LLaVA-family models.

Capability parity with the reference's use of HF ``CLIPVisionModel`` inside
vllm/model_executor/models/llava.py (vision_tower + feature-layer select),
re-designed TPU-first: a plain param pytree, layers stacked and run under
``lax.scan``, full (non-causal) attention as one fused XLA softmax-matmul —
no kernel needed at ~577 tokens/image.

Weight layout notes (HF CLIPVisionModel):
  embeddings.patch_embedding.weight [Hv, 3, p, p]  (conv, no bias)
  embeddings.class_embedding        [Hv]
  embeddings.position_embedding.weight [np+1, Hv]
  pre_layrnorm (sic, HF typo)       LayerNorm before the encoder
  encoder.layers.{i}.{self_attn.{q,k,v,out}_proj, layer_norm1/2, mlp.fc1/2}
The post_layernorm only feeds CLIP's pooled head and is unused by LLaVA's
hidden-state feature select (vision_feature_layer=-2 ⇒ run L-1 layers).
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.layers.activation import gelu_quick
from neural_magic_vllm_tpu.layers.norm import layer_norm


def _linear(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"]) + p["b"]


class CLIPVisionTower:
    """Functional CLIP vision encoder producing per-patch hidden states."""

    def __init__(self, vision_config, feature_layer: int = -2,
                 select_strategy: str = "default") -> None:
        cfg = vision_config
        self.cfg = cfg
        self.hidden_size = cfg.hidden_size
        self.intermediate_size = cfg.intermediate_size
        self.num_layers = cfg.num_hidden_layers
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.image_size = cfg.image_size
        self.patch_size = cfg.patch_size
        self.grid = cfg.image_size // cfg.patch_size
        self.num_positions = self.grid * self.grid + 1
        self.eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.act = gelu_quick if getattr(cfg, "hidden_act",
                                         "quick_gelu") == "quick_gelu" \
            else jax.nn.gelu
        # vision_feature_layer=-2 ⇒ hidden_states[-2] ⇒ run L-1 layers.
        if feature_layer < 0:
            self.layers_to_run = self.num_layers + 1 + feature_layer
        else:
            self.layers_to_run = feature_layer
        self.drop_cls = select_strategy == "default"
        # patches contributed per image to the language sequence
        self.tokens_per_image = self.grid * self.grid + \
            (0 if self.drop_cls else 1)

    # --- params ---------------------------------------------------------------
    def init_params(self, rng: np.random.Generator) -> Dict[str, Any]:
        Hv, Iv, p = self.hidden_size, self.intermediate_size, self.patch_size

        def lin(i, o):
            s = 1.0 / np.sqrt(i)
            return {"w": rng.uniform(-s, s, (i, o)).astype(np.float32),
                    "b": np.zeros((o, ), np.float32)}

        def ln():
            return {"scale": np.ones((Hv, ), np.float32),
                    "bias": np.zeros((Hv, ), np.float32)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "ln1": ln(), "ln2": ln(),
                "q": lin(Hv, Hv), "k": lin(Hv, Hv), "v": lin(Hv, Hv),
                "out": lin(Hv, Hv),
                "fc1": lin(Hv, Iv), "fc2": lin(Iv, Hv),
            })
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)
        return {
            "class_embedding": (rng.standard_normal(
                (Hv, )) * 0.02).astype(np.float32),
            "patch_embedding": (rng.standard_normal(
                (Hv, 3, p, p)) * 0.02).astype(np.float32),
            "position_embedding": (rng.standard_normal(
                (self.num_positions, Hv)) * 0.02).astype(np.float32),
            "pre_ln": ln(),
            "layers": stacked,
        }

    _HF_LIN = {"self_attn.q_proj": "q", "self_attn.k_proj": "k",
               "self_attn.v_proj": "v", "self_attn.out_proj": "out",
               "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
    _HF_LN = {"layer_norm1": "ln1", "layer_norm2": "ln2"}

    def load_into(self, raw_layers: List[Dict], params: Dict[str, Any],
                  name: str, w: np.ndarray) -> bool:
        """Consume one ``vision_model.``-relative tensor."""
        if name == "embeddings.class_embedding":
            params["class_embedding"] = w
        elif name == "embeddings.patch_embedding.weight":
            params["patch_embedding"] = w
        elif name == "embeddings.position_embedding.weight":
            params["position_embedding"] = w
        elif name.startswith("pre_layrnorm."):
            tgt = params.setdefault("pre_ln", {})
            tgt["scale" if name.endswith("weight") else "bias"] = w
        elif name.startswith("encoder.layers."):
            parts = name.split(".")
            idx = int(parts[2])
            sub = ".".join(parts[3:-1])
            kind = parts[-1]
            layer = raw_layers[idx]
            if sub in self._HF_LIN:
                tgt = layer.setdefault(self._HF_LIN[sub], {})
                if kind == "weight":
                    tgt["w"] = w.T.copy()
                else:
                    tgt["b"] = w
            elif sub in self._HF_LN:
                tgt = layer.setdefault(self._HF_LN[sub], {})
                tgt["scale" if kind == "weight" else "bias"] = w
            else:
                return False
        elif name.startswith("post_layernorm."):
            return True  # pooled-head only; unused by feature select
        else:
            return False
        return True

    # --- forward ----------------------------------------------------------------
    def _embed(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, np+1, Hv] (class token + patches + pos)."""
        dtype = params["patch_embedding"].dtype
        x = pixel_values.astype(dtype)
        patches = jax.lax.conv_general_dilated(
            x, params["patch_embedding"],
            window_strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        N = patches.shape[0]
        patches = patches.reshape(N, self.hidden_size,
                                  self.grid * self.grid)
        patches = jnp.transpose(patches, (0, 2, 1))  # [N, np, Hv]
        cls = jnp.broadcast_to(params["class_embedding"][None, None, :],
                               (N, 1, self.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        return x + params["position_embedding"][None, :, :].astype(dtype)

    def _layer(self, lp, x: jax.Array) -> jax.Array:
        N, T, Hv = x.shape
        nh, hd = self.num_heads, self.head_dim
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], self.eps)
        q = _linear(lp["q"], h).reshape(N, T, nh, hd)
        k = _linear(lp["k"], h).reshape(N, T, nh, hd)
        v = _linear(lp["v"], h).reshape(N, T, nh, hd)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * (hd**-0.5), axis=-1).astype(v.dtype)
        attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, T, Hv)
        x = x + _linear(lp["out"], attn)
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], self.eps)
        h = self.act(_linear(lp["fc1"], h))
        return x + _linear(lp["fc2"], h)

    def forward(self, params: Dict[str, Any],
                pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, tokens_per_image, Hv] selected features."""
        x = self._embed(params, pixel_values)
        x = layer_norm(x, params["pre_ln"]["scale"],
                       params["pre_ln"]["bias"], self.eps)
        n_run = self.layers_to_run
        run = jax.tree_util.tree_map(lambda a: a[:n_run], params["layers"])

        def body(carry, lp):
            return self._layer(lp, carry), None

        x, _ = jax.lax.scan(body, x, run)
        return x[:, 1:, :] if self.drop_cls else x
