"""DeepSpeedFP weight quantization (reference
vllm/model_executor/layers/quantization/deepspeedfp.py, used by Arctic):
ordinary fp16/bf16 checkpoints are quantized AT LOAD into low-bit float
storage to halve HBM residency, and dequantized on the fly.

TPU version: fp8 (e4m3) storage with a per-output-channel absmax scale —
native fp8 arrays in HBM, dequant fused into the matmul epilogue (the
scale is per-column so it commutes with the contraction). 6/12-bit
DeepSpeed floats have no TPU storage dtype; quant_bits != 8 is rejected."""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

_FP8_MAX = 448.0  # e4m3 finite max


class DeepSpeedFPLinearMethod(LinearMethod):

    hf_param_names = ("weight", "bias")
    hf_transpose = ("weight", )

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
        scale = np.maximum(absmax, 1e-12) / _FP8_MAX
        q = (w / scale).astype(jnp.float8_e4m3fn)
        params = {"qweight": q, "weight_scale": scale.astype(np.float32)}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        w = params["qweight"].astype(jnp.float32)
        out = jnp.dot(x.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32)
        out = out * params["weight_scale"]
        if "bias" in params:
            out = out + params["bias"]
        return out.astype(x.dtype)


class DeepSpeedFPConfig(QuantizationConfig):

    def __init__(self, weight_bits: int = 8,
                 group_size: int = 512) -> None:
        if weight_bits != 8:
            raise ValueError(
                f"deepspeedfp quant_bits={weight_bits} unsupported on TPU "
                "(8 only: fp8 e4m3 storage)")
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
        return DeepSpeedFPLinearMethod()
