"""Phi-3-Vision (reference vllm/model_executor/models/phi3v.py): a Phi-3
language model whose image embeddings come from a CLIP ViT (penultimate
layer, patch features) put through the HD transform — per crop a 2x2
feature merge to [half, half, 4C], the global crop and the reassembled
sub-crop grid each gaining a learnable sub_GN separator column per row,
joined glb + glb_GN + sub (phi3v.py:149-247) — then a Linear/GELU/Linear
projection into the text width. The HD reassembly runs eagerly at request
ingestion with static shapes per padded image size (like LLaVA-NeXT here);
prefill merges embeddings with the shared branch-free gather."""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.clip import CLIPVisionTower
from neural_magic_vllm_tpu.models.phi3 import Phi3ForCausalLM


@register_model("Phi3VForCausalLM")
class Phi3VForCausalLM(Phi3ForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        hf = model_config.hf_config
        self._hf_config = hf
        self.image_token_id = hf.image_token_index
        img_proc = dict(getattr(hf, "img_processor", None) or {})
        embd = dict(getattr(hf, "embd_layer", None) or {})
        self.hd_order = embd.get("hd_transform_order", "glb_sub")
        self.vision = CLIPVisionTower(
            hf.vision_config,
            feature_layer=int(img_proc.get("layer_idx", -2)),
            select_strategy="default")  # type_feature="patch": drop CLS

    # --- params -------------------------------------------------------------
    def _init_vision_extras(self, rng: np.random.Generator,
                            params: Dict[str, Any]) -> None:
        C4 = 4 * self.vision.hidden_size
        Ht = self.hidden_size

        def lin(i, o):
            s = 1.0 / np.sqrt(i)
            return {"w": rng.uniform(-s, s, (i, o)).astype(np.float32),
                    "b": np.zeros((o, ), np.float32)}

        params["glb_GN"] = (rng.standard_normal(
            (C4, )) * 0.02).astype(np.float32)
        params["sub_GN"] = (rng.standard_normal(
            (C4, )) * 0.02).astype(np.float32)
        params["projector"] = {"l1": lin(C4, Ht), "l2": lin(Ht, Ht)}

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.llama import cast_params_to
        params = super().init_params(rng)
        nprng = np.random.default_rng(0)
        extras: Dict[str, Any] = {}
        self._init_vision_extras(nprng, extras)
        extras["vision"] = self.vision.init_params(nprng)
        params.update(cast_params_to(extras, self.dtype))
        return params

    # --- loading ------------------------------------------------------------
    _V_PREFIX = "model.vision_embed_tokens."

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.llama import (cast_params_to,
                                                        stack_layer_params)
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        params: Dict[str, Any] = {}
        layers: List[Dict] = [dict() for _ in range(self.num_layers)]
        v_params: Dict[str, Any] = {}
        v_layers: List[Dict] = [dict()
                                for _ in range(self.vision.num_layers)]
        proj: Dict[str, Dict[str, np.ndarray]] = {"l1": {}, "l2": {}}
        _PROJ = {"0": "l1", "2": "l2"}
        for name, w in iterate_safetensors(model_dir):
            if name.startswith(self._V_PREFIX):
                sub = name[len(self._V_PREFIX):]
                if sub.startswith("img_processor.vision_model."):
                    self.vision.load_into(
                        v_layers, v_params,
                        sub[len("img_processor.vision_model."):], w)
                elif sub == "glb_GN":
                    params["glb_GN"] = w.reshape(-1)
                elif sub == "sub_GN":
                    params["sub_GN"] = w.reshape(-1)
                elif sub.startswith("img_projection."):
                    parts = sub.split(".")
                    if parts[1] in _PROJ:
                        key = "w" if parts[2] == "weight" else "b"
                        proj[_PROJ[parts[1]]][key] = \
                            w.T.copy() if key == "w" else w
            else:
                self._load_into_layers(layers, name, w, params)
        if self.tie_embeddings or "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
        self._finalize_layers(layers)
        params["layers"] = stack_layer_params(layers)
        v_params["layers"] = stack_layer_params(v_layers)
        params["vision"] = v_params
        params["projector"] = proj
        return cast_params_to(params, self.dtype)

    # --- vision forward -----------------------------------------------------
    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, grid*grid, C] raw CLIP patch features (the
        HD transform + projection happen per image in encode_request)."""
        return self.vision.forward(params["vision"], pixel_values)

    def _merge_2x2(self, feats: jax.Array) -> jax.Array:
        """[n, grid*grid, C] -> [n, half, half, 4C]
        (phi3v.py:199-202,215-217)."""
        n = feats.shape[0]
        C = feats.shape[-1]
        g = self.vision.grid
        half = g // 2
        f = feats.reshape(n, half, 2, half, 2, C)
        f = jnp.transpose(f, (0, 1, 3, 2, 4, 5))
        return f.reshape(n, half, half, 4 * C)

    def _project(self, params, x: jax.Array) -> jax.Array:
        p = params["projector"]
        x = jnp.dot(x, p["l1"]["w"]) + p["l1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        return jnp.dot(x, p["l2"]["w"]) + p["l2"]["b"]

    def encode_request(self, params: Dict[str, Any],
                       mm_data: Dict[str, Any]) -> jax.Array:
        if getattr(self, "_encode_jit", None) is None:
            self._encode_jit = jax.jit(self.encode_images)
        pv = np.asarray(mm_data["pixel_values"], np.float32)
        sizes = np.asarray(mm_data["image_sizes"]).reshape(-1, 2)
        cpi = np.asarray(mm_data["crops_per_image"]).tolist()
        P = pv.shape[0]
        n_pad = 1 << (P - 1).bit_length()
        if n_pad > P:
            pv = np.concatenate(
                [pv, np.zeros((n_pad - P, ) + pv.shape[1:], np.float32)])
        feats = self._encode_jit(params, jnp.asarray(pv))  # [P', g*g, C]
        S = self.vision.image_size
        half = self.vision.grid // 2
        C4 = 4 * self.vision.hidden_size
        sub_GN = params["sub_GN"].astype(feats.dtype)
        glb_GN = params["glb_GN"].astype(feats.dtype)
        out = []
        c0 = 0
        for i, n_crops in enumerate(cpi):
            img_feats = feats[c0:c0 + n_crops]
            c0 += n_crops
            ph, pw = (int(v) for v in sizes[i])
            h, w = ph // S, pw // S
            # global crop: [half, half, 4C] + separator column per row
            glb = self._merge_2x2(img_feats[:1])[0]
            sep = jnp.broadcast_to(sub_GN[None, None, :], (half, 1, C4))
            glb = jnp.concatenate([glb, sep],
                                  axis=1).reshape(-1, C4)  # half*(half+1)
            # sub crops: raster grid [h*half, w*half, 4C] + separator col
            sub = self._merge_2x2(img_feats[1:1 + h * w])
            sub = sub.reshape(h, w, half, half, C4)
            sub = jnp.transpose(sub, (0, 2, 1, 3, 4)).reshape(
                h * half, w * half, C4)
            sep = jnp.broadcast_to(sub_GN[None, None, :], (h * half, 1, C4))
            sub = jnp.concatenate([sub, sep], axis=1).reshape(-1, C4)
            if self.hd_order == "glb_sub":
                joined = jnp.concatenate([glb, glb_GN[None, :], sub])
            else:  # sub_glb
                joined = jnp.concatenate([sub, glb_GN[None, :], glb])
            out.append(self._project(params, joined))
        return jnp.concatenate(out, axis=0)
