"""Multimodal input registry (reference vllm/multimodal/registry.py:16 +
vllm/inputs/registry.py:82, merged: image data -> model tensors AND prompt
placeholder expansion live together here).

Accepted ``multi_modal_data={"image": ...}`` values:
  - a PIL.Image.Image, or a list of them
  - a numpy array [H, W, 3] uint8/float (or a list / stacked [N, H, W, 3])
  - a pre-processed dict {"pixel_values": [N, 3, S, S]} (passthrough)

The default mapper implements CLIP preprocessing (shortest-edge resize,
center crop, rescale, normalize) against the model's vision_config — the
role of HF's CLIPImageProcessor without requiring processor files in the
checkpoint directory.
"""
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

# OpenAI-CLIP normalization constants (HF CLIPImageProcessor defaults).
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_image_list(data: Any) -> List[Any]:
    if isinstance(data, (list, tuple)):
        return list(data)
    if isinstance(data, np.ndarray) and data.ndim == 4:
        return [data[i] for i in range(data.shape[0])]
    return [data]


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[H, W, 3] float32 -> [out_h, out_w, 3] (PIL bicubic if available,
    else numpy bilinear — test checkpoints exercise exact-size images)."""
    try:
        from PIL import Image
        pil = Image.fromarray(
            np.clip(img, 0, 255).astype(np.uint8)) if img.dtype != np.uint8 \
            else Image.fromarray(img)
        return np.asarray(pil.resize((out_w, out_h), Image.BICUBIC),
                          np.float32)
    except ImportError:  # pragma: no cover
        ys = np.linspace(0, img.shape[0] - 1, out_h)
        xs = np.linspace(0, img.shape[1] - 1, out_w)
        yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
        return img[yi][:, xi].astype(np.float32)


def clip_image_mapper(vision_config, data: Any) -> Dict[str, np.ndarray]:
    """Image(s) -> {"pixel_values": [N, 3, S, S] float32}."""
    if isinstance(data, dict):
        pv = np.asarray(data["pixel_values"], np.float32)
        if pv.ndim == 3:
            pv = pv[None]
        return {"pixel_values": pv}
    S = vision_config.image_size
    out = []
    for img in _to_image_list(data):
        if hasattr(img, "convert"):  # PIL image
            img = np.asarray(img.convert("RGB"), np.float32)
        img = np.asarray(img, np.float32)
        if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
            img = np.transpose(img, (1, 2, 0))  # CHW -> HWC
        h, w = img.shape[:2]
        if (h, w) != (S, S):
            scale = S / min(h, w)  # shortest-edge resize, then center crop
            nh, nw = max(S, int(round(h * scale))), max(
                S, int(round(w * scale)))
            img = _resize_bilinear(img, nh, nw)
            top, left = (nh - S) // 2, (nw - S) // 2
            img = img[top:top + S, left:left + S]
        if img.max() > 1.5:  # uint8-range input
            img = img / 255.0
        img = (img - _CLIP_MEAN) / _CLIP_STD
        out.append(np.transpose(img, (2, 0, 1)))  # HWC -> CHW
    return {"pixel_values": np.stack(out).astype(np.float32)}


class MultiModalRegistry:
    """Maps raw per-request multimodal data to model input tensors and
    expands prompt placeholders to patch-token runs."""

    def __init__(self) -> None:
        self._mappers: Dict[str, Callable] = {}

    def register_image_mapper(self, arch: str,
                              mapper: Optional[Callable] = None) -> None:
        self._mappers[arch] = mapper or clip_image_mapper

    def supports(self, hf_config) -> bool:
        return hasattr(hf_config, "vision_config") and \
            hasattr(hf_config, "image_token_index")

    def map_input(self, hf_config, multi_modal_data: Dict[str, Any]
                  ) -> Dict[str, np.ndarray]:
        if "image" not in multi_modal_data:
            raise ValueError(
                f"Unsupported multi_modal_data keys: "
                f"{sorted(multi_modal_data)} (expected 'image')")
        arch = (getattr(hf_config, "architectures", None) or [""])[0]
        mapper = self._mappers.get(arch, clip_image_mapper)
        return mapper(hf_config.vision_config, multi_modal_data["image"])

    @staticmethod
    def tokens_per_image(hf_config) -> int:
        vc = hf_config.vision_config
        grid = (vc.image_size // vc.patch_size)**2
        strategy = getattr(hf_config, "vision_feature_select_strategy",
                           "default")
        return grid if strategy == "default" else grid + 1

    def expand_placeholders(self, hf_config, prompt_token_ids: List[int],
                            num_images: int) -> Tuple[List[int], int]:
        """Expand each image placeholder token into tokens_per_image copies
        (the reference's input-processor repeat_and_pad_image_tokens role).
        A prompt with no placeholder gets them PREPENDED (one run per
        image). Returns (expanded_ids, tokens_per_image)."""
        tok = hf_config.image_token_index
        tpi = self.tokens_per_image(hf_config)
        n_holders = sum(1 for t in prompt_token_ids if t == tok)
        if n_holders == 0 and num_images > 0:
            prompt_token_ids = [tok] * num_images + list(prompt_token_ids)
            n_holders = num_images
        if tpi > 1 and n_holders == num_images * tpi:
            return list(prompt_token_ids), tpi  # already expanded
        if n_holders != num_images:
            raise ValueError(
                f"Prompt has {n_holders} image placeholder(s) but "
                f"{num_images} image(s) were supplied.")
        out: List[int] = []
        for t in prompt_token_ids:
            if t == tok:
                out.extend([tok] * tpi)
            else:
                out.append(t)
        return out, tpi


MULTIMODAL_REGISTRY = MultiModalRegistry()
