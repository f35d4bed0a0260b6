"""LoRA adapter loading (reference vllm/lora/models.py LoRAModel).

Parses a HF peft checkpoint (adapter_config.json + adapter safetensors) into
per-layer A/B matrices keyed by this engine's linear names
(q/k/v/o/gate/up/down), padded to the serving max rank.
"""
import json
import os
from typing import Dict, List, Optional

import numpy as np

_HF_TO_KEY = {
    "q_proj": "q",
    "k_proj": "k",
    "v_proj": "v",
    "o_proj": "o",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}


class LoRAModel:
    """One adapter: per (layer, linear) A [in, r] and B [r, out], a single
    scaling = alpha / r (peft convention)."""

    def __init__(self, rank: int, scaling: float,
                 a: Dict[str, List[Optional[np.ndarray]]],
                 b: Dict[str, List[Optional[np.ndarray]]],
                 num_layers: int) -> None:
        self.rank = rank
        self.scaling = scaling
        self.a = a  # key -> per-layer [in, r] or None
        self.b = b  # key -> per-layer [r, out] or None
        self.num_layers = num_layers

    @classmethod
    def from_local_checkpoint(cls, path: str, num_layers: int,
                              max_rank: int) -> "LoRAModel":
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        rank = int(cfg["r"])
        if rank > max_rank:
            raise ValueError(
                f"adapter rank {rank} > --max-lora-rank {max_rank}")
        scaling = float(cfg.get("lora_alpha", rank)) / rank

        from safetensors.numpy import load_file
        for fname in ("adapter_model.safetensors", "adapter_model.bin"):
            fpath = os.path.join(path, fname)
            if os.path.exists(fpath):
                break
        else:
            raise FileNotFoundError(f"no adapter weights in {path}")
        if fpath.endswith(".bin"):
            import torch
            tensors = {k: v.float().numpy()
                       for k, v in torch.load(fpath, map_location="cpu",
                                              weights_only=True).items()}
        else:
            tensors = load_file(fpath)

        a: Dict[str, List[Optional[np.ndarray]]] = {
            k: [None] * num_layers for k in _HF_TO_KEY.values()}
        b: Dict[str, List[Optional[np.ndarray]]] = {
            k: [None] * num_layers for k in _HF_TO_KEY.values()}
        for name, w in tensors.items():
            # ...model.layers.{i}.(self_attn|mlp).{proj}.lora_(A|B).weight
            parts = name.split(".")
            try:
                li = parts.index("layers")
            except ValueError:
                continue
            layer_idx = int(parts[li + 1])
            proj = parts[li + 3]
            kind = parts[li + 4]  # lora_A | lora_B
            key = _HF_TO_KEY.get(proj)
            if key is None:
                continue
            w = np.asarray(w, np.float32)
            if kind == "lora_A":
                a[key][layer_idx] = w.T.copy()  # [r, in] -> [in, r]
            elif kind == "lora_B":
                b[key][layer_idx] = w.T.copy()  # [out, r] -> [r, out]
        return cls(rank, scaling, a, b, num_layers)

    def padded(self, key: str, layer: int, in_dim: int, out_dim: int,
               max_rank: int):
        """(A [in, max_rank], B [max_rank, out]) zero-padded; zeros when the
        adapter does not target this linear."""
        a = self.a[key][layer]
        b = self.b[key][layer]
        a_out = np.zeros((in_dim, max_rank), np.float32)
        b_out = np.zeros((max_rank, out_dim), np.float32)
        if a is not None and b is not None:
            a_out[:, :a.shape[1]] = a
            b_out[:b.shape[0], :] = b
        return a_out, b_out
