"""GPTQ checkpoint ingestion -> TPU WNA16 method.

Capability parity with the reference's gptq_marlin path (gptq_marlin.py:59):
GPTQ-format checkpoints (AutoGPTQ / GPTQ-for-LLaMa) are unpacked host-side
and repacked into the MXU-tiled layout of ops/quant.py — the analogue of the
Marlin repack-on-load (gptq_marlin.py:389-447). Act-order (desc_act/g_idx)
is handled like Marlin does: rows are permuted so groups become sequential
and the inverse permutation is applied to activations at runtime.

GPTQ tensor formats (per linear, K=in_features, N=out_features, pf=32/bits):
  qweight [K/pf, N] int32 — pf values per word along K, LSB-first
  qzeros  [G, N/pf] int32 — packed along N, stored as (zero - 1)
  scales  [G, N] fp16
  g_idx   [K] int32 — group index of each input row (act-order only)
"""
from typing import Any, Dict, List, Optional

import numpy as np

from neural_magic_vllm_tpu.quantization.base import QuantizationConfig
from neural_magic_vllm_tpu.quantization.wna16 import WNA16LinearMethod


def unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """[K/pf, N] int32 -> [K, N] unsigned levels (LSB-first along K)."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    qw = qweight.view(np.uint32) if qweight.dtype != np.uint32 else qweight
    out = np.empty((qweight.shape[0] * pf, qweight.shape[1]), np.uint32)
    for i in range(pf):
        out[i::pf] = (qw >> (bits * i)) & mask
    return out


def unpack_gptq_qzeros(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """[G, N/pf] int32 -> [G, N] zero points. GPTQ stores (zero - 1)."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    qz = qzeros.view(np.uint32) if qzeros.dtype != np.uint32 else qzeros
    G, Np = qz.shape
    out = np.empty((G, Np * pf), np.uint32)
    for i in range(pf):
        out[:, i::pf] = (qz >> (bits * i)) & mask
    return (out + 1) & mask


class GPTQLinearMethod(WNA16LinearMethod):
    """WNA16 with GPTQ checkpoint-format conversion."""

    hf_param_names = ("qweight", "qzeros", "scales", "g_idx", "bias")
    hf_transpose = ()  # GPTQ tensors are already in-features-first

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        bits = self.bits
        q = unpack_gptq_qweight(raw["qweight"], bits)  # [K, N]
        K = q.shape[0]
        scales = raw["scales"].astype(np.float32)  # [G, N]
        zeros = None
        if "qzeros" in raw:
            z = unpack_gptq_qzeros(raw["qzeros"], bits).astype(np.float32)
            sym_z = float(1 << (bits - 1))
            if np.all(z == sym_z):
                zeros = None  # symmetric: use the kernel's constant path
            else:
                zeros = z
        input_perm = None
        g_idx = raw.get("g_idx")
        if g_idx is not None:
            g_idx = np.asarray(g_idx, np.int64)
            gs = K if self.group_size in (-1, None) else self.group_size
            sequential = np.arange(K) // gs
            if not np.array_equal(g_idx, sequential):
                # act-order: stable-sort rows by group so groups are
                # sequential; activations get the same permutation.
                input_perm = np.argsort(g_idx, kind="stable").astype(np.int32)
                q = q[input_perm]
        params = self.pack(q, scales, zeros, input_perm)
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params


class GPTQConfig(QuantizationConfig):
    """Parsed from HF quantize_config.json / config.json quantization_config
    (reference gptq.py:17, gptq_marlin.py:59)."""

    def __init__(self, bits: int, group_size: int, desc_act: bool,
                 sym: bool = True) -> None:
        if bits not in (4, 8):
            raise ValueError(f"GPTQ bits={bits} unsupported on TPU "
                             "(4/8 only, like gptq_marlin)")
        self.bits = bits
        self.group_size = group_size
        self.desc_act = desc_act
        self.sym = sym

    @classmethod
    def get_name(cls) -> str:
        return "gptq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQConfig":
        return cls(bits=cls.get_from_keys(config, ["bits"]),
                   group_size=cls.get_from_keys(config, ["group_size"]),
                   desc_act=bool(config.get("desc_act", False)),
                   sym=bool(config.get("sym", True)))

    def get_linear_method(self) -> GPTQLinearMethod:
        return GPTQLinearMethod(self.bits, self.group_size, self.sym)
