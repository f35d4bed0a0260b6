"""Checkpoint iteration utilities (analogue of reference
vllm/model_executor/model_loader/weight_utils.py)."""
import glob
import json
import os
from typing import Iterator, Tuple

import numpy as np


def iterate_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, float32-or-int numpy array) for every tensor in the
    checkpoint. Loads via torch to handle bf16/fp16 storage."""
    import torch
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        # .bin fallback
        bins = sorted(glob.glob(os.path.join(model_dir,
                                             "pytorch_model*.bin")))
        if not bins:
            raise FileNotFoundError(
                f"No safetensors or bin checkpoints under {model_dir}")
        for f in bins:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in sd.items():
                yield name, _to_numpy(t)
        return
    for f in files:
        with safe_open(f, framework="pt", device="cpu") as reader:
            for name in reader.keys():
                yield name, _to_numpy(reader.get_tensor(name))


def _to_numpy(t) -> np.ndarray:
    import torch
    if t.dtype in (torch.bfloat16, torch.float16):
        return t.to(torch.float32).numpy()
    return t.numpy()
