"""LLaVA: CLIP vision tower + MLP projector + Llama language model.

Capability parity with the reference vllm/model_executor/models/llava.py,
re-designed for TPU:
- the tower + projector run as their OWN jitted executable
  (``encode_images``) once per request; the language prefill receives the
  flat patch-embedding table plus a per-slot gather index and merges
  image embeddings with a branch-free ``where`` — no dynamic scatter, no
  [chunk, hidden] host transfer, chunked prefill crosses image spans
  freely (the reference merges with an in-place masked index_put,
  llava.py merge_vision_embeddings).
- the language side IS LlamaForCausalLM: same scan/TP/quantization seams;
  the vision tower stays unquantized and replicated (it is ~2% of FLOPs).
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.clip import CLIPVisionTower
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("LlavaForConditionalGeneration")
class LlavaForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        hf = model_config.hf_config
        self.image_token_id = hf.image_token_index
        self.vision = CLIPVisionTower(
            hf.vision_config,
            feature_layer=getattr(hf, "vision_feature_layer", -2),
            select_strategy=getattr(hf, "vision_feature_select_strategy",
                                    "default"))
        self.tokens_per_image = self.vision.tokens_per_image

    # --- params ---------------------------------------------------------------
    def _init_projector(self, rng: np.random.Generator) -> Dict[str, Any]:
        Hv, Ht = self.vision.hidden_size, self.hidden_size

        def lin(i, o):
            s = 1.0 / np.sqrt(i)
            return {"w": rng.uniform(-s, s, (i, o)).astype(np.float32),
                    "b": np.zeros((o, ), np.float32)}

        return {"l1": lin(Hv, Ht), "l2": lin(Ht, Ht)}

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(0)
        from neural_magic_vllm_tpu.models.llama import cast_params_to
        params["vision"] = cast_params_to(self.vision.init_params(nprng),
                                          self.dtype)
        params["projector"] = cast_params_to(self._init_projector(nprng),
                                             self.dtype)
        return params

    # --- HF loading -------------------------------------------------------------
    # Checkpoint prefixes (both vintages):
    #   language_model.model.* / language_model.lm_head.*   (legacy)
    #   model.language_model.* + top-level lm_head.*        (4.5x module tree)
    #   vision_tower.vision_model.* | model.vision_tower.vision_model.*
    #   multi_modal_projector.*    | model.multi_modal_projector.*
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
        _PROJ = {"linear_1": "l1", "linear_2": "l2"}
        for name, w in iterate_safetensors(model_dir):
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub  # 4.5x tree: language_model.layers…
                self._load_into_layers(layers, sub, w, params)
            elif name.startswith("lm_head."):
                self._load_into_layers(layers, name, w, params)
            elif name.startswith("vision_tower.vision_model."):
                self.vision.load_into(
                    v_layers, v_params,
                    name[len("vision_tower.vision_model."):], w)
            elif name == "image_newline":  # llava_next
                params["image_newline"] = w
            elif name.startswith("multi_modal_projector."):
                parts = name.split(".")
                if parts[1] in _PROJ:
                    key = "w" if parts[2] == "weight" else "b"
                    proj[_PROJ[parts[1]]][key] = \
                        w.T.copy() if key == "w" else w
        if self.tie_embeddings or "lm_head" not in params:
            params["lm_head"] = params["embed"].T.copy()
        self._finalize_layers(layers)
        params["layers"] = stack_layer_params(layers)
        v_params["layers"] = stack_layer_params(v_layers)
        params["vision"] = v_params
        params["projector"] = proj
        return cast_params_to(params, self.dtype)

    # --- forward ----------------------------------------------------------------
    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, tokens_per_image, H_text] projected patch
        embeddings (row-major patch order matches placeholder
        expansion)."""
        feats = self.vision.forward(params["vision"], pixel_values)
        p = params["projector"]
        x = jnp.dot(feats, p["l1"]["w"]) + p["l1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        return jnp.dot(x, p["l2"]["w"]) + p["l2"]["b"]

    def encode_request(self, params: Dict[str, Any],
                       mm_data: Dict[str, Any]) -> jax.Array:
        """All of one request's images -> flat [total_tokens, H_text]
        (the runner caches this per request across prefill chunks)."""
        if getattr(self, "_encode_jit", None) is None:
            self._encode_jit = jax.jit(self.encode_images)
        import numpy as np_
        pv = np_.asarray(mm_data["pixel_values"], np_.float32)
        N = pv.shape[0]
        n_pad = 1 << (N - 1).bit_length()  # pow2 bucket bounds compiles
        if n_pad > N:
            pv = np_.concatenate(
                [pv, np_.zeros((n_pad - N, ) + pv.shape[1:], np_.float32)])
        feats = self._encode_jit(params, jnp.asarray(pv))
        return feats[:N].reshape(-1, self.hidden_size)
