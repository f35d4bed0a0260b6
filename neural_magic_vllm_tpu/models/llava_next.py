"""LLaVA-NeXT (v1.6): AnyRes tiled vision encoding.

Capability parity with the reference vllm/model_executor/models/llava_next.py,
re-designed for TPU: the vision tower runs over ALL crops of a request in
one jitted call (crop count padded to a pow2 bucket); the per-image
spatial reassembly — grid restitch, aspect-ratio unpad, newline embedding
per row (HF pack_image_features) — happens eagerly at request-ingestion
time with shapes that are STATIC per image size, producing the flat
embedding table the shared merge path consumes. Chunked prefill and the
per-slot gather merge are inherited unchanged from LLaVA.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llava import LlavaForConditionalGeneration
from neural_magic_vllm_tpu.multimodal.registry import (
    _anyres_unpadded_grid, select_best_resolution)


@register_model("LlavaNextForConditionalGeneration")
class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init_params(rng)
        params["image_newline"] = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (self.hidden_size, )) * 0.02, self.dtype)
        return params

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
        feats = self._encode_jit(params, jnp.asarray(pv))  # [P', tpc, Ht]
        newline = params["image_newline"].astype(feats.dtype)
        side = self.vision.grid
        top_cfg = self._top_config
        out = []
        c0 = 0
        for i, n_crops in enumerate(cpi):
            img_feats = feats[c0:c0 + n_crops]
            c0 += n_crops
            if n_crops == 1:
                out.append(jnp.concatenate([img_feats[0], newline[None]]))
                continue
            base = img_feats[0]
            hw = tuple(int(v) for v in sizes[i])
            S = top_cfg.vision_config.image_size
            bh, bw = select_best_resolution(hw,
                                            top_cfg.image_grid_pinpoints)
            nph, npw = bh // S, bw // S
            cur_h, cur_w, uh, uw = _anyres_unpadded_grid(top_cfg, hw)
            Ht = self.hidden_size
            f = img_feats[1:].reshape(nph, npw, side, side, Ht)
            f = jnp.transpose(f, (4, 0, 2, 1, 3)).reshape(Ht, cur_h, cur_w)
            ph, pw = (cur_h - uh) // 2, (cur_w - uw) // 2
            f = f[:, ph:cur_h - ph, pw:cur_w - pw]
            nl = jnp.broadcast_to(newline[:, None, None], (Ht, uh, 1))
            f = jnp.concatenate([f, nl], axis=2)  # [Ht, uh, uw+1]
            flat = f.reshape(Ht, -1).T  # [uh*(uw+1), Ht]
            out.append(jnp.concatenate([base, flat], axis=0))
        return jnp.concatenate(out, axis=0)

    @property
    def _top_config(self):
        # LlamaForCausalLM.__init__ keeps hf_text_config as self.cfg; the
        # anyres metadata lives on the composite config.
        return self._model_config.hf_config

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        super().__init__(model_config, parallel_config, quant_config)
        self._model_config = model_config
