"""SqueezeLLM weight-only LUT quantization (reference
vllm/model_executor/layers/quantization/squeezellm.py +
csrc/quantization/squeezellm/quant_cuda_kernel.cu).

Format (per linear, K=in, N=out, pf=32/bits):
  qweight       [K/pf, N] int32 — pf sequential K-levels per word
  lookup_table  [N, 2^bits] — per-output-channel non-uniform codebook

TPU execution: the packed words stay resident; dequant is an in-graph
unpack + per-channel gather feeding a dense MXU matmul (the role of the
CUDA LUT-dequant kernel)."""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig


def pack_squeezellm(levels: np.ndarray, bits: int) -> np.ndarray:
    """[K, N] unsigned levels -> [K/pf, N] int32 (sequential along K)."""
    pf = 32 // bits
    K, N = levels.shape
    assert K % pf == 0
    words = np.zeros((K // pf, N), np.uint32)
    for s in range(pf):
        words |= (levels[s::pf].astype(np.uint32) & ((1 << bits) - 1)) \
            << (bits * s)
    return words.view(np.int32)


class SqueezeLLMLinearMethod(LinearMethod):

    hf_param_names = ("qweight", "lookup_table", "bias")
    hf_transpose = ()

    def __init__(self, bits: int) -> None:
        assert bits == 4, f"squeezellm bits={bits} unsupported (4 only)"
        self.bits = bits
        self.pack_factor = 32 // bits

    def create_params(self, rng, in_features, out_features, use_bias):
        qweight = rng.integers(
            0, 2**32, (in_features // self.pack_factor, out_features),
            dtype=np.uint64).astype(np.uint32).view(np.int32)
        scale = 1.0 / np.sqrt(in_features)
        lut = np.linspace(-scale, scale, 2**self.bits,
                          dtype=np.float32)[None].repeat(out_features, 0)
        params = {"qweight": qweight, "lookup_table": lut}
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        if partition == "column":
            specs = {"qweight": P(None, "model"),
                     "lookup_table": P("model", None)}
            bias_spec = P("model")
        elif partition == "row":
            specs = {"qweight": P("model", None),
                     "lookup_table": P(None, None)}
            bias_spec = P(None)
        else:
            specs = {"qweight": P(None, None),
                     "lookup_table": P(None, None)}
            bias_spec = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = {"qweight": raw["qweight"],
                  "lookup_table": raw["lookup_table"].astype(np.float32)}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        words = params["qweight"].view(jnp.uint32)  # [K/pf, N]
        bits, pf = self.bits, self.pack_factor
        mask = jnp.uint32((1 << bits) - 1)
        # unpack to [K, N]: level of row k lives in word k//pf, slot k%pf
        levels = jnp.stack(
            [(words >> jnp.uint32(bits * s)) & mask for s in range(pf)],
            axis=1).reshape(-1, words.shape[1])
        lut = params["lookup_table"]  # [N, 2^bits]
        w = jnp.take_along_axis(lut, levels.T.astype(jnp.int32), axis=1).T
        out = jnp.dot(x.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32)
        if "bias" in params:
            out = out + params["bias"]
        return out.astype(x.dtype)


class SqueezeLLMConfig(QuantizationConfig):

    def __init__(self, weight_bits: int) -> None:
        self.weight_bits = weight_bits

    @classmethod
    def get_name(cls) -> str:
        return "squeezellm"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SqueezeLLMConfig":
        return cls(weight_bits=cls.get_from_keys(config,
                                                 ["wbits", "bits",
                                                  "weight_bits"]))

    def get_linear_method(self) -> SqueezeLLMLinearMethod:
        return SqueezeLLMLinearMethod(self.weight_bits)
