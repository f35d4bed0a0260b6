"""AQLM additive-codebook quantization (reference
vllm/model_executor/layers/quantization/aqlm.py +
csrc/quantization/aqlm/gemm_kernels.cu).

Format (per linear, K=in, N=out):
  codes     [N/og, K/ig, num_codebooks] int — codebook entry per group
  codebooks [num_codebooks, 2^nbits, og, ig]
  scales    [N/og, 1, 1, 1]

Weight = scale * sum_c codebooks[c][codes[..., c]]. TPU execution: codes
and codebooks stay resident; the in-graph gather + sum reconstructs the
weight tile feeding a dense MXU matmul (the CUDA kernel's role)."""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig


class AQLMLinearMethod(LinearMethod):

    hf_param_names = ("codes", "codebooks", "scales", "bias")
    hf_transpose = ()

    def __init__(self, in_group_size: int, out_group_size: int,
                 num_codebooks: int, nbits: int) -> None:
        self.ig = in_group_size
        self.og = out_group_size
        self.num_codebooks = num_codebooks
        self.nbits = nbits

    def create_params(self, rng, in_features, out_features, use_bias):
        size = 2**self.nbits
        codes = rng.integers(
            0, size, (out_features // self.og, in_features // self.ig,
                      self.num_codebooks)).astype(np.int32)
        scale = 1.0 / np.sqrt(in_features) / self.num_codebooks
        codebooks = (rng.standard_normal(
            (self.num_codebooks, size, self.og, self.ig)) * scale).astype(
                np.float32)
        params = {"codes": codes, "codebooks": codebooks,
                  "scales": np.ones((out_features // self.og, 1, 1, 1),
                                    np.float32)}
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        if partition == "column":
            specs = {"codes": P("model", None, None),
                     "codebooks": P(None, None, None, None),
                     "scales": P("model", None, None, None)}
            bias_spec = P("model")
        elif partition == "row":
            specs = {"codes": P(None, "model", None),
                     "codebooks": P(None, None, None, None),
                     "scales": P(None, None, None, None)}
            bias_spec = P(None)
        else:
            specs = {"codes": P(None, None, None),
                     "codebooks": P(None, None, None, None),
                     "scales": P(None, None, None, None)}
            bias_spec = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        codes = np.asarray(raw["codes"]).astype(np.int64) % (2**self.nbits)
        params = {"codes": codes.astype(np.int32),
                  "codebooks": raw["codebooks"].astype(np.float32),
                  "scales": raw["scales"].astype(np.float32).reshape(
                      -1, 1, 1, 1)}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        codes = params["codes"]  # [Nog, Kig, cb]
        cbs = params["codebooks"]  # [cb, size, og, ig]
        Nog, Kig, ncb = codes.shape
        og, ig = cbs.shape[2], cbs.shape[3]
        w = jnp.zeros((Nog, Kig, og, ig), jnp.float32)
        for c in range(ncb):
            w = w + jnp.take(cbs[c], codes[:, :, c], axis=0)
        w = w * params["scales"]
        # [Nog, Kig, og, ig] -> [N, K] -> [K, N]
        w = jnp.transpose(w, (0, 2, 1, 3)).reshape(Nog * og, Kig * ig).T
        out = jnp.dot(x.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32)
        if "bias" in params:
            out = out + params["bias"]
        return out.astype(x.dtype)


class AQLMConfig(QuantizationConfig):

    def __init__(self, in_group_size: int, out_group_size: int,
                 num_codebooks: int, nbits_per_codebook: int) -> None:
        self.in_group_size = in_group_size
        self.out_group_size = out_group_size
        self.num_codebooks = num_codebooks
        self.nbits_per_codebook = nbits_per_codebook

    @classmethod
    def get_name(cls) -> str:
        return "aqlm"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AQLMConfig":
        return cls(
            in_group_size=cls.get_from_keys(config, ["in_group_size"]),
            out_group_size=cls.get_from_keys(config, ["out_group_size"]),
            num_codebooks=cls.get_from_keys(config, ["num_codebooks"]),
            nbits_per_codebook=cls.get_from_keys(config,
                                                 ["nbits_per_codebook"]))

    def get_linear_method(self) -> AQLMLinearMethod:
        return AQLMLinearMethod(self.in_group_size, self.out_group_size,
                                self.num_codebooks, self.nbits_per_codebook)
