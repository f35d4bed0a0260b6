"""BitsAndBytes NF4 weight quantization (reference
vllm/model_executor/layers/quantization/bitsandbytes.py + the
BitsAndBytesModelLoader, loader.py:605): an fp16/bf16 checkpoint is
quantized AT LOAD into 4-bit NormalFloat with per-block absmax scales
(QLoRA load_in_4bit semantics) — no bnb library needed.

Storage (per linear, K=in, N=out, block=64 along K):
  qweight [K/8, N] int32 — packed 4-bit NF4 codes, sequential along K
  absmax  [K/64, N] float32 — per-block scale
Dequant = nf4_table[code] * absmax, reconstructed in-graph into the MXU
matmul."""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

# The 16 NF4 quantiles (Dettmers et al., QLoRA; bitsandbytes functional.py)
NF4_TABLE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0
], np.float32)

_BLOCK = 64


class BitsAndBytesLinearMethod(LinearMethod):

    hf_param_names = ("weight", "bias")
    hf_transpose = ("weight", )

    def create_params(self, rng, in_features, out_features, use_bias):
        scale = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-scale, scale,
                        (in_features, out_features)).astype(np.float32)
        raw = {"weight": w}
        if use_bias:
            raw["bias"] = np.zeros((out_features, ), np.float32)
        return self.convert_hf(raw)

    def param_specs(self, partition, use_bias):
        if partition == "column":
            specs = {"qweight": P(None, "model"), "absmax": P(None, "model")}
            bias_spec = P("model")
        elif partition == "row":
            specs = {"qweight": P("model", None), "absmax": P("model", None)}
            bias_spec = P(None)
        else:
            specs = {"qweight": P(None, None), "absmax": P(None, None)}
            bias_spec = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = raw["weight"].astype(np.float32)  # [K, N]
        K, N = w.shape
        pad = (-K) % _BLOCK
        if pad:
            w = np.concatenate([w, np.zeros((pad, N), np.float32)])
        Kp = w.shape[0]
        blocks = w.reshape(Kp // _BLOCK, _BLOCK, N)
        absmax = np.maximum(np.abs(blocks).max(axis=1), 1e-12)  # [B, N]
        normed = blocks / absmax[:, None, :]
        # nearest NF4 level
        codes = np.abs(normed.reshape(-1, 1) - NF4_TABLE[None, :]).argmin(
            axis=1).astype(np.uint32).reshape(Kp, N)
        words = np.zeros((Kp // 8, N), np.uint32)
        for s in range(8):
            words |= (codes[s::8] & 0xF) << (4 * s)
        params = {"qweight": words.view(np.int32),
                  "absmax": absmax.astype(np.float32)}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        words = params["qweight"].view(jnp.uint32)  # [Kp/8, N]
        codes = jnp.stack(
            [(words >> jnp.uint32(4 * s)) & jnp.uint32(0xF)
             for s in range(8)], axis=1).reshape(-1, words.shape[1])
        table = jnp.asarray(NF4_TABLE)
        w = table[codes.astype(jnp.int32)]  # [Kp, N]
        absmax = params["absmax"]  # [Kp/64, N]
        w = (w.reshape(absmax.shape[0], _BLOCK, -1) *
             absmax[:, None, :]).reshape(w.shape)
        K = x.shape[-1]
        out = jnp.dot(x.astype(jnp.float32), w[:K],
                      preferred_element_type=jnp.float32)
        if "bias" in params:
            out = out + params["bias"]
        return out.astype(x.dtype)


class BitsAndBytesConfig(QuantizationConfig):

    @classmethod
    def get_name(cls) -> str:
        return "bitsandbytes"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "BitsAndBytesConfig":
        return cls()

    def get_linear_method(self) -> BitsAndBytesLinearMethod:
        return BitsAndBytesLinearMethod()
