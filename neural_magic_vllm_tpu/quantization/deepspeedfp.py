"""DeepSpeedFP weight quantization (reference
vllm/model_executor/layers/quantization/deepspeedfp.py, used by Arctic):
ordinary fp16/bf16 checkpoints are quantized AT LOAD into low-bit float
storage to cut HBM residency, and dequantized on the fly.

TPU version, by bit width:
- 8-bit: fp8 (e4m3) storage with a per-output-channel absmax scale —
  native fp8 arrays in HBM, dequant fused into the matmul epilogue (the
  scale is per-column so it commutes with the contraction).
- 4-bit (e2m1) / 6-bit (e3m2) / 12-bit (e4m7): no native TPU storage
  dtype, so the weights are rounded to the exact fp4/fp6/fp12 value grid
  at load and stored as integer CODES (uint8 / uint16); dequant is one
  in-graph LUT gather (16 / 64 / 4096 entries). Numerics match the
  DeepSpeed float format bit-for-bit; storage rounds up to the container
  byte width, which still halves (or quarters) bf16 residency.
  fp4's 16-level grid is coarse — the reference ships it for Arctic's
  finetuned checkpoints (deepspeedfp.py quant_bits 4/6/8/12) and so do
  we, gated by the same per-output-channel absmax scaling; expect a
  larger perplexity delta than fp6/fp8 on non-finetuned weights.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

_FP8_MAX = 448.0  # e4m3 finite max


def _float_grid(exp_bits: int, man_bits: int) -> np.ndarray:
    """All 2^(1+exp_bits+man_bits) values of a sign/exp/mantissa float
    format (no inf/nan: the top exponent is an ordinary binade, matching
    DeepSpeed's saturating quantizer). Index == code."""
    n = 1 << (1 + exp_bits + man_bits)
    codes = np.arange(n, dtype=np.uint32)
    sign = np.where(codes >> (exp_bits + man_bits), -1.0, 1.0)
    exp = (codes >> man_bits) & ((1 << exp_bits) - 1)
    man = codes & ((1 << man_bits) - 1)
    bias = (1 << (exp_bits - 1)) - 1
    frac = man.astype(np.float64) / (1 << man_bits)
    normal = (1.0 + frac) * np.exp2(exp.astype(np.float64) - bias)
    subnormal = frac * np.exp2(1.0 - bias)
    return (sign * np.where(exp == 0, subnormal, normal)).astype(np.float32)


_FORMATS = {4: (2, 1), 6: (3, 2), 12: (4, 7)}  # bits -> (e, m)


def _quantize_to_grid(w: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Round-to-nearest onto the format grid; returns integer codes."""
    order = np.argsort(grid)
    sorted_vals = grid[order]
    # nearest-neighbour via midpoints
    mids = (sorted_vals[1:] + sorted_vals[:-1]) / 2
    idx = np.searchsorted(mids, w)
    return order[idx].astype(np.uint16)


class DeepSpeedFPLinearMethod(LinearMethod):

    hf_param_names = ("weight", "bias")
    hf_transpose = ("weight", )

    def __init__(self, weight_bits: int = 8) -> None:
        self.weight_bits = weight_bits
        if weight_bits != 8:
            eb, mb = _FORMATS[weight_bits]
            self._grid = _float_grid(eb, mb)
            self._fmax = float(np.max(self._grid))

    def create_params(self, rng, in_features, out_features, use_bias):
        scale = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-scale, scale,
                        (in_features, out_features)).astype(np.float32)
        return self.convert_hf({"weight": w} if not use_bias else {
            "weight": w, "bias": np.zeros((out_features, ), np.float32)})

    def param_specs(self, partition, use_bias):
        if partition == "column":
            specs = {"qweight": P(None, "model"),
                     "weight_scale": P(None, "model")}
            bias_spec = P("model")
        elif partition == "row":
            specs = {"qweight": P("model", None),
                     "weight_scale": P(None, None)}
            bias_spec = P(None)
        else:
            specs = {"qweight": P(None, None),
                     "weight_scale": P(None, None)}
            bias_spec = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = raw["weight"].astype(np.float32)  # [K, N]
        absmax = np.abs(w).max(axis=0, keepdims=True)  # [1, N]
        if self.weight_bits == 8:
            scale = np.maximum(absmax, 1e-12) / _FP8_MAX
            q = (w / scale).astype(jnp.float8_e4m3fn)
        else:
            scale = np.maximum(absmax, 1e-12) / self._fmax
            codes = _quantize_to_grid(w / scale, self._grid)
            q = codes.astype(np.uint8) if self.weight_bits <= 6 \
                else codes
        params = {"qweight": q, "weight_scale": scale.astype(np.float32)}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        qw = params["qweight"]
        if self.weight_bits == 8:
            w = qw.astype(jnp.float32)
        else:
            table = jnp.asarray(self._grid)
            w = jnp.take(table, qw.astype(jnp.int32), axis=0)
        out = jnp.dot(x.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32)
        out = out * params["weight_scale"]
        if "bias" in params:
            out = out + params["bias"]
        return out.astype(x.dtype)


class DeepSpeedFPConfig(QuantizationConfig):

    def __init__(self, weight_bits: int = 8,
                 group_size: int = 512) -> None:
        if weight_bits not in (4, 6, 8, 12):
            raise ValueError(
                f"deepspeedfp quant_bits={weight_bits} unsupported "
                "(4 / 6 / 8 / 12, matching the reference)")
        self.weight_bits = weight_bits
        self.group_size = group_size

    @classmethod
    def get_name(cls) -> str:
        return "deepspeedfp"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "DeepSpeedFPConfig":
        return cls(weight_bits=int(config.get("bits",
                                              config.get("quant_bits", 8))),
                   group_size=int(config.get("group_size", 512)))

    def get_linear_method(self) -> DeepSpeedFPLinearMethod:
        return DeepSpeedFPLinearMethod(self.weight_bits)
