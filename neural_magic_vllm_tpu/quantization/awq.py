"""AWQ checkpoint ingestion -> TPU WNA16 method (reference awq.py:13 +
csrc/quantization/awq/dequantize.cuh).

AWQ tensor formats (K=in_features, N=out_features, pf=32/bits):
  qweight [K, N/pf] int32 — pf values per word along N, in the interleaved
          order (0, 2, 4, 6, 1, 3, 5, 7) for 4-bit
  qzeros  [G, N/pf] int32 — same packing, true zero points (no -1 offset)
  scales  [G, N] fp16
AWQ is always asymmetric (zero points kept).
"""
from typing import Any, Dict

import numpy as np

from neural_magic_vllm_tpu.quantization.base import QuantizationConfig
from neural_magic_vllm_tpu.quantization.wna16 import WNA16LinearMethod

_AWQ_ORDER_4BIT = (0, 2, 4, 6, 1, 3, 5, 7)


def unpack_awq(packed: np.ndarray, bits: int) -> np.ndarray:
    """[R, N/pf] int32 -> [R, N] unsigned levels, undoing the AWQ
    interleave."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    order = _AWQ_ORDER_4BIT if bits == 4 else tuple(range(pf))
    pk = packed.view(np.uint32) if packed.dtype != np.uint32 else packed
    R, Np = pk.shape
    out = np.empty((R, Np * pf), np.uint32)
    for slot, col in enumerate(order):
        out[:, col::pf] = (pk >> (bits * slot)) & mask
    return out


class AWQLinearMethod(WNA16LinearMethod):

    hf_param_names = ("qweight", "qzeros", "scales", "bias")
    hf_transpose = ()  # AWQ tensors are already in-features-first

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        q = unpack_awq(raw["qweight"], self.bits)  # [K, N]
        zeros = unpack_awq(raw["qzeros"], self.bits).astype(np.float32)
        scales = raw["scales"].astype(np.float32)
        params = self.pack(q, scales, zeros)
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params


class AWQConfig(QuantizationConfig):

    def __init__(self, bits: int, group_size: int, zero_point: bool) -> None:
        if bits != 4:
            raise ValueError(f"AWQ bits={bits} unsupported (4 only)")
        self.bits = bits
        self.group_size = group_size
        self.zero_point = zero_point

    @classmethod
    def get_name(cls) -> str:
        return "awq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AWQConfig":
        return cls(bits=cls.get_from_keys(config, ["w_bit", "bits"]),
                   group_size=cls.get_from_keys(config,
                                                ["q_group_size",
                                                 "group_size"]),
                   zero_point=bool(
                       cls.get_from_keys(config, ["zero_point"])))

    def get_linear_method(self) -> AWQLinearMethod:
        return AWQLinearMethod(self.bits, self.group_size, sym=False)
