"""INT8 W8A8 linear method (reference compressed-tensors W8A8 scheme,
compressed_tensors/schemes/compressed_tensors_w8a8.py:14 + the CUTLASS
epilogue-scaled GEMM csrc/quantization/cutlass_w8a8/).

TPU-native: the MXU multiplies int8 x int8 with int32 accumulation natively
(jax.lax.dot_general preferred_element_type=int32); per-tensor or
per-output-channel weight scales and the dynamic activation scale are
applied to the int32 result — the epilogue fusion XLA performs for free.
"""
from typing import Any, Dict

import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.ops.quant import int8_scaled_mm
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig


class Int8W8A8LinearMethod(LinearMethod):

    def __init__(self, per_channel: bool = True,
                 activation_scheme: str = "dynamic") -> None:
        self.per_channel = per_channel
        self.activation_scheme = activation_scheme

    hf_param_names = ("weight", "weight_scale", "input_scale",
                      "weight_zero_point", "input_zero_point", "bias")

    def _quantize(self, w: np.ndarray) -> Dict[str, Any]:
        if self.per_channel:
            amax = np.maximum(np.abs(w).max(axis=0), 1e-12)  # [N]
        else:
            amax = max(float(np.abs(w).max()), 1e-12)
        scale = (amax / 127.0).astype(np.float32)
        wq = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
        return {"weight": wq, "weight_scale": scale}

    def create_params(self, rng, in_features, out_features, use_bias):
        s = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-s, s, (in_features, out_features)).astype(np.float32)
        params = self._quantize(w)
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = raw["weight"]
        if w.dtype == np.int8 and "weight_scale" in raw:
            scale = np.asarray(raw["weight_scale"], np.float32)
            # loader transposed weight to [K, N]; per-channel scales are [N]
            params = {"weight": w, "weight_scale": scale.reshape(-1)
                      if scale.size > 1 else np.float32(scale.reshape(()))}
        else:
            params = self._quantize(np.asarray(w, np.float32))
        if "input_scale" in raw:
            params["input_scale"] = np.float32(raw["input_scale"].reshape(
                ()))
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def param_specs(self, partition, use_bias):
        if partition == "column":
            w_spec, n_spec, bias_spec = P(None, "model"), P("model"), \
                P("model")
        elif partition == "row":
            w_spec, n_spec, bias_spec = P("model", None), P(None), P(None)
        else:
            w_spec, n_spec, bias_spec = P(None, None), P(None), P(None)
        specs = {"weight": w_spec,
                 "weight_scale": n_spec if self.per_channel else P(),
                 "input_scale": P()}
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params, x):
        act_scale = params.get("input_scale") \
            if self.activation_scheme == "static" else None
        return int8_scaled_mm(x, params["weight"], params["weight_scale"],
                              act_scale=act_scale, bias=params.get("bias"),
                              out_dtype=x.dtype)
