"""compressed-tensors config format (Neural Magic's flagship; reference
compressed_tensors/compressed_tensors.py:19): parses the sparseml /
compressed-tensors HF config and picks a scheme:

- W8A8 int8 (per-tensor or per-channel weights, dynamic/static activations)
  -> Int8W8A8LinearMethod (schemes/compressed_tensors_w8a8.py)
- WNA16 (pack-quantized int4/int8 weight-only)
  -> CompressedTensorsWNA16LinearMethod (schemes/compressed_tensors_wNa16.py)

Checkpoint tensors for pack-quantized (out-first, like HF):
  weight_packed [N, K/pf] int32 (pf values per word along K, LSB-first)
  weight_scale  [N, G] fp16, weight_shape [2]
The engine's loader transposes 2-D tensors to in-first before convert_hf.
"""
from typing import Any, Dict, Optional

import numpy as np

from neural_magic_vllm_tpu.quantization.base import QuantizationConfig
from neural_magic_vllm_tpu.quantization.gptq import unpack_gptq_qweight
from neural_magic_vllm_tpu.quantization.int8_w8a8 import Int8W8A8LinearMethod
from neural_magic_vllm_tpu.quantization.wna16 import WNA16LinearMethod


class CompressedTensorsWNA16LinearMethod(WNA16LinearMethod):

    hf_param_names = ("weight_packed", "weight_scale", "weight_zero_point",
                      "weight_shape", "bias")
    hf_transpose = ("weight_packed", "weight_scale")  # stored out-first

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # weight_packed arrives [K/pf, N] (loader transposes 2-D tensors);
        # packing is along K, LSB-first — same word format as GPTQ.
        q = unpack_gptq_qweight(raw["weight_packed"], self.bits)
        scales = np.asarray(raw["weight_scale"], np.float32)
        if scales.shape[0] != q.shape[0] // (self.group_size if
                                             self.group_size > 0 else
                                             q.shape[0]):
            scales = scales.T  # [N, G] checkpoints
        params = self.pack(q, scales, None)
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params


class CompressedTensorsConfig(QuantizationConfig):

    def __init__(self, scheme: str, bits: int = 8, group_size: int = -1,
                 per_channel: bool = True,
                 activation_scheme: str = "dynamic") -> None:
        self.scheme = scheme  # "w8a8" | "wNa16"
        self.bits = bits
        self.group_size = group_size
        self.per_channel = per_channel
        self.activation_scheme = activation_scheme

    @classmethod
    def get_name(cls) -> str:
        return "compressed-tensors"

    @classmethod
    def from_config(cls, config: Dict[str, Any]
                    ) -> "CompressedTensorsConfig":
        groups = config.get("config_groups", {})
        if not groups:
            raise ValueError("compressed-tensors config has no "
                             "config_groups")
        group = next(iter(groups.values()))
        weights = group.get("weights", {})
        acts = group.get("input_activations") or {}
        w_bits = int(weights.get("num_bits", 8))
        w_strategy = weights.get("strategy", "tensor")
        gs = int(weights.get("group_size") or -1)
        # marlin-24 serialization = 2:4-sparse WNA16 (reference
        # compressed_tensors.py:137-139 -> CompressedTensorsW4A16Sparse24)
        if config.get("format") == "marlin-24":
            return cls("w4a16_24", bits=w_bits, group_size=gs)
        if acts:  # weight+activation quantization -> W8A8
            if w_bits != 8:
                raise ValueError(f"W{w_bits}A8 unsupported")
            dynamic = bool(acts.get("dynamic", True))
            return cls("w8a8", bits=8,
                       per_channel=(w_strategy == "channel"),
                       activation_scheme="dynamic" if dynamic else "static")
        return cls("wNa16", bits=w_bits, group_size=gs)

    def get_linear_method(self):
        if self.scheme == "w8a8":
            return Int8W8A8LinearMethod(self.per_channel,
                                        self.activation_scheme)
        if self.scheme == "w4a16_24":
            from neural_magic_vllm_tpu.quantization.marlin_24 import \
                Marlin24LinearMethod
            return Marlin24LinearMethod(self.bits, self.group_size)
        return CompressedTensorsWNA16LinearMethod(self.bits, self.group_size,
                                                  sym=True)
