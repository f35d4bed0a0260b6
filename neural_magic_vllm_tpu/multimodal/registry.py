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


def select_best_resolution(orig_hw: Tuple[int, int],
                           pinpoints: List[List[int]]) -> Tuple[int, int]:
    """Best (h, w) among grid pinpoints: max effective resolution, ties by
    min wasted area (HF select_best_resolution)."""
    oh, ow = orig_hw
    best, best_fit, min_waste = None, -1, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_fit or (eff == best_fit and waste < min_waste):
            best, best_fit, min_waste = (h, w), eff, waste
    return best


def _anyres_unpadded_grid(hf_config, orig_hw) -> Tuple[int, int, int, int]:
    """(grid_h_feats, grid_w_feats, unpadded_h, unpadded_w) for one image
    (HF get_anyres_image_grid_shape + unpad_image arithmetic)."""
    vc = hf_config.vision_config
    S = vc.image_size
    side = S // vc.patch_size
    bh, bw = select_best_resolution(tuple(orig_hw),
                                    hf_config.image_grid_pinpoints)
    nph, npw = bh // S, bw // S
    cur_h, cur_w = nph * side, npw * side
    oh, ow = orig_hw
    if ow / oh > cur_w / cur_h:
        new_h = int(round(oh * (cur_w / ow), 7))
        pad = (cur_h - new_h) // 2
        return cur_h, cur_w, cur_h - 2 * pad, cur_w
    new_w = int(round(ow * (cur_h / oh), 7))
    pad = (cur_w - new_w) // 2
    return cur_h, cur_w, cur_h, cur_w - 2 * pad


def llava_next_image_mapper(hf_config, data: Any) -> Dict[str, np.ndarray]:
    """AnyRes tiling (HF LlavaNextImageProcessor): per image, a base
    resize to the vision size plus S x S tiles of the best-fit padded
    resolution. Returns pixel_values [total_crops, 3, S, S], image_sizes
    [N, 2], crops_per_image [N]."""
    if isinstance(data, dict):  # pre-processed passthrough
        pv = np.asarray(data["pixel_values"], np.float32)
        sizes = np.asarray(data["image_sizes"], np.int64).reshape(-1, 2)
        if "crops_per_image" in data:
            cpi = np.asarray(data["crops_per_image"], np.int64)
        else:
            assert sizes.shape[0] == 1, \
                "crops_per_image required for multi-image passthrough"
            cpi = np.asarray([pv.shape[0]], np.int64)
        return {"pixel_values": pv, "image_sizes": sizes,
                "crops_per_image": cpi}
    vc = hf_config.vision_config
    S = vc.image_size
    crops, sizes, cpi = [], [], []
    for img in _to_image_list(data):
        if hasattr(img, "convert"):
            img = np.asarray(img.convert("RGB"), np.float32)
        img = np.asarray(img, np.float32)
        if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
            img = np.transpose(img, (1, 2, 0))
        oh, ow = img.shape[:2]
        sizes.append((oh, ow))
        bh, bw = select_best_resolution((oh, ow),
                                        hf_config.image_grid_pinpoints)
        # scale to fit, pad to (bh, bw) centered
        scale = min(bw / ow, bh / oh)
        nh, nw = min(bh, int(round(oh * scale))), min(
            bw, int(round(ow * scale)))
        scaled = _resize_bilinear(img, nh, nw)
        padded = np.zeros((bh, bw, 3), np.float32)
        top, left = (bh - nh) // 2, (bw - nw) // 2
        padded[top:top + nh, left:left + nw] = scaled

        def norm(x):
            if x.max() > 1.5:
                x = x / 255.0
            return np.transpose((x - _CLIP_MEAN) / _CLIP_STD, (2, 0, 1))

        per_img = [norm(_resize_bilinear(img, S, S))]  # base crop
        for i in range(0, bh, S):
            for j in range(0, bw, S):
                per_img.append(norm(padded[i:i + S, j:j + S]))
        crops.extend(per_img)
        cpi.append(len(per_img))
    return {"pixel_values": np.stack(crops).astype(np.float32),
            "image_sizes": np.asarray(sizes, np.int64),
            "crops_per_image": np.asarray(cpi, np.int64)}


def _phi3v_hd_size(orig_hw: Tuple[int, int], unit: int,
                   hd_num: int) -> Tuple[int, int]:
    """(padded_h, padded_w) after the Phi-3-Vision HD transform (reference
    phi3v.py _calc_hd_transform_size:289-310, generalized from 336 to the
    vision patch unit)."""
    import math
    oh, ow = orig_hw
    w, h = ow, oh
    trans = False
    if w < h:
        w, h = h, w
        trans = True
    ratio = w / h
    scale = 1
    while scale * math.ceil(scale / ratio) <= hd_num:
        scale += 1
    scale -= 1
    new_w = int(scale * unit)
    new_h = int(new_w / ratio)
    pad_h = int(math.ceil(new_h / unit) * unit)
    pw, ph = new_w, pad_h
    if trans:
        pw, ph = ph, pw
    return ph, pw


def phi3v_image_mapper(hf_config, data: Any) -> Dict[str, np.ndarray]:
    """Phi-3-Vision HD tiling (HF image_processing_phi3_v): per image, a
    global crop (whole padded image resized to the vision size) followed by
    the SxS raster tiles of the white-padded HD-resized image. Returns
    pixel_values [total_crops, 3, S, S], image_sizes [N, 2] (padded h, w),
    crops_per_image [N]."""
    if isinstance(data, dict):
        pv = np.asarray(data["pixel_values"], np.float32)
        sizes = np.asarray(data["image_sizes"], np.int64).reshape(-1, 2)
        if "crops_per_image" in data:
            cpi = np.asarray(data["crops_per_image"], np.int64)
        else:
            assert sizes.shape[0] == 1
            cpi = np.asarray([pv.shape[0]], np.int64)
        return {"pixel_values": pv, "image_sizes": sizes,
                "crops_per_image": cpi}
    vc = hf_config.vision_config
    S = vc.image_size
    hd_num = int(getattr(hf_config, "num_crops", 16))
    crops, sizes, cpi = [], [], []

    def norm(x):
        if x.max() > 1.5:
            x = x / 255.0
        return np.transpose((x - _CLIP_MEAN) / _CLIP_STD, (2, 0, 1))

    for img in _to_image_list(data):
        if hasattr(img, "convert"):
            img = np.asarray(img.convert("RGB"), np.float32)
        img = np.asarray(img, np.float32)
        if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
            img = np.transpose(img, (1, 2, 0))
        oh, ow = img.shape[:2]
        ph, pw = _phi3v_hd_size((oh, ow), S, hd_num)
        # resize preserving aspect, pad (white) centered on the short axis
        scale = min(pw / ow, ph / oh)
        nh, nw = min(ph, int(round(oh * scale))), min(
            pw, int(round(ow * scale)))
        scaled = _resize_bilinear(img, nh, nw)
        if scaled.max() > 1.5:
            pad_val = 255.0
        else:
            pad_val = 1.0
        padded = np.full((ph, pw, 3), pad_val, np.float32)
        top, left = (ph - nh) // 2, (pw - nw) // 2
        padded[top:top + nh, left:left + nw] = scaled
        sizes.append((ph, pw))
        per_img = [norm(_resize_bilinear(padded, S, S))]  # global first
        for i in range(0, ph, S):
            for j in range(0, pw, S):
                per_img.append(norm(padded[i:i + S, j:j + S]))
        crops.extend(per_img)
        cpi.append(len(per_img))
    return {"pixel_values": np.stack(crops).astype(np.float32),
            "image_sizes": np.asarray(sizes, np.int64),
            "crops_per_image": np.asarray(cpi, np.int64)}


def phi3v_tokens_per_image(hf_config, padded_hw: Tuple[int, int]) -> int:
    """(h*w+1)*half^2 + 1 + (h+1)*half with half = grid//2 (reference
    phi3v.py get_phi3v_image_feature_size:314-326, 336-general)."""
    vc = hf_config.vision_config
    S = vc.image_size
    half = (S // vc.patch_size) // 2
    h, w = padded_hw[0] // S, padded_hw[1] // S
    return (h * w + 1) * half * half + 1 + (h + 1) * half


class MultiModalRegistry:
    """Maps raw per-request multimodal data to model input tensors and
    expands prompt placeholders to patch-token runs."""

    _ANYRES_ARCHS = ("LlavaNextForConditionalGeneration", )
    _PHI3V_ARCHS = ("Phi3VForCausalLM", )

    def __init__(self) -> None:
        self._mappers: Dict[str, Callable] = {}

    def register_image_mapper(self, arch: str,
                              mapper: Optional[Callable] = None) -> None:
        self._mappers[arch] = mapper or clip_image_mapper

    def supports(self, hf_config) -> bool:
        return hasattr(hf_config, "vision_config") and \
            hasattr(hf_config, "image_token_index")

    @staticmethod
    def _arch(hf_config) -> str:
        return (getattr(hf_config, "architectures", None) or [""])[0]

    def map_input(self, hf_config, multi_modal_data: Dict[str, Any]
                  ) -> Dict[str, np.ndarray]:
        if "image" not in multi_modal_data:
            raise ValueError(
                f"Unsupported multi_modal_data keys: "
                f"{sorted(multi_modal_data)} (expected 'image')")
        arch = self._arch(hf_config)
        if arch in self._mappers:
            mapper = self._mappers[arch]
            return mapper(hf_config.vision_config,
                          multi_modal_data["image"])
        if arch in self._ANYRES_ARCHS:
            return llava_next_image_mapper(hf_config,
                                           multi_modal_data["image"])
        if arch in self._PHI3V_ARCHS:
            return phi3v_image_mapper(hf_config, multi_modal_data["image"])
        return clip_image_mapper(hf_config.vision_config,
                                 multi_modal_data["image"])

    @staticmethod
    def tokens_per_image(hf_config) -> int:
        vc = hf_config.vision_config
        grid = (vc.image_size // vc.patch_size)**2
        strategy = getattr(hf_config, "vision_feature_select_strategy",
                           "default")
        return grid if strategy == "default" else grid + 1

    def tokens_per_image_list(self, hf_config,
                              mm_inputs: Dict[str, np.ndarray]
                              ) -> List[int]:
        """Per-image language-token counts for the mapped inputs."""
        if self._arch(hf_config) in self._ANYRES_ARCHS:
            base = self.tokens_per_image(hf_config)
            out = []
            for hw in np.asarray(mm_inputs["image_sizes"]).tolist():
                _, _, uh, uw = _anyres_unpadded_grid(hf_config, hw)
                out.append(base + uh * (uw + 1))  # +1: newline per row
            return out
        if self._arch(hf_config) in self._PHI3V_ARCHS:
            return [phi3v_tokens_per_image(hf_config, tuple(hw)) for hw in
                    np.asarray(mm_inputs["image_sizes"]).tolist()]
        n = mm_inputs["pixel_values"].shape[0]
        return [self.tokens_per_image(hf_config)] * n

    def expand_placeholders(self, hf_config, prompt_token_ids: List[int],
                            mm_inputs: Dict[str, np.ndarray]
                            ) -> List[int]:
        """Expand the i-th image placeholder token into that image's token
        count (the reference's input-processor repeat_and_pad_image_tokens
        role). A prompt with no placeholder gets them PREPENDED."""
        tok = hf_config.image_token_index
        counts = self.tokens_per_image_list(hf_config, mm_inputs)
        num_images = len(counts)
        n_holders = sum(1 for t in prompt_token_ids if t == tok)
        if n_holders == 0 and num_images > 0:
            prompt_token_ids = [tok] * num_images + list(prompt_token_ids)
            n_holders = num_images
        if n_holders == sum(counts):
            return list(prompt_token_ids)  # already expanded
        if n_holders != num_images:
            raise ValueError(
                f"Prompt has {n_holders} image placeholder(s) but "
                f"{num_images} image(s) were supplied.")
        out: List[int] = []
        it = iter(counts)
        for t in prompt_token_ids:
            if t == tok:
                out.extend([tok] * next(it))
            else:
                out.append(t)
        return out


MULTIMODAL_REGISTRY = MultiModalRegistry()
