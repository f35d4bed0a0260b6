"""Weight-only INT4/INT8 (WxA16) linear method — the TPU analogue of the
reference's gptq_marlin method (gptq_marlin.py:192).

Storage (per linear):
  qweight [K // (32//bits), N] int32  — pack_int_tiled layout (ops/quant.py)
  scales  [G, N] float32
  zeros   [G, N] float32 (asymmetric checkpoints only)
  input_perm [K] int32 (act-order/desc_act checkpoints only: activations are
  permuted so quantization groups become sequential — the same trick Marlin's
  repack applies to g_idx weights, gptq_marlin.py:389-447)

Checkpoint ingestion happens in quantization/gptq.py / awq.py (format
unpacking) followed by ``WNA16LinearMethod.pack()`` (TPU repack).
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.ops.quant import (pack_int_tiled, quant_matmul_ref,
                                             select_k_tile)


def _use_pallas() -> bool:
    from neural_magic_vllm_tpu import envs
    override = envs.NMV_TPU_QUANT_BACKEND
    if override is not None:
        return override == "pallas"
    return jax.default_backend() in ("tpu", "axon")


class WNA16LinearMethod(LinearMethod):

    def __init__(self, bits: int, group_size: int, sym: bool = True) -> None:
        assert bits in (4, 8), bits
        self.bits = bits
        self.group_size = group_size
        self.sym = sym
        self.pack_factor = 32 // bits

    def _groups(self, in_features: int) -> int:
        gs = self.group_size
        return 1 if gs in (-1, None) else in_features // gs

    def pack(self, q: np.ndarray, scales: np.ndarray,
             zeros: Optional[np.ndarray],
             input_perm: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """[K, N] unsigned int levels + [G, N] scales -> device param dict."""
        K = q.shape[0]
        kt = select_k_tile(K, self.group_size, self.bits)
        params = {
            "qweight": pack_int_tiled(q, self.bits, kt),
            "scales": scales.astype(np.float32),
        }
        if zeros is not None:
            params["zeros"] = zeros.astype(np.float32)
        if input_perm is not None:
            params["input_perm"] = input_perm.astype(np.int32)
        return params

    def create_params(self, rng, in_features, out_features, use_bias):
        """Random quantized init (dummy load format, for profiling and
        throughput benches without checkpoint downloads). Packed words are
        drawn directly — uniform bits ARE uniform int4/int8 levels — so an
        8B-scale init stays fast."""
        G = self._groups(in_features)
        qweight = rng.integers(0, 2**32,
                               (in_features // self.pack_factor,
                                out_features),
                               dtype=np.uint64).astype(np.uint32).view(
                                   np.int32)
        # scale ~ uniform weight init std / half-range
        scale = (1.0 / np.sqrt(in_features)) / (1 << (self.bits - 1))
        scales = (scale * rng.uniform(0.7, 1.3, (G, out_features))).astype(
            np.float32)
        params = {"qweight": qweight, "scales": scales}
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        if partition == "column":
            spec2d, bias_spec = P(None, "model"), P("model")
        elif partition == "row":
            spec2d, bias_spec = P("model", None), P(None)
        else:
            spec2d, bias_spec = P(None, None), P(None)
        specs = {"qweight": spec2d, "scales": spec2d}
        # zeros/input_perm, when present, follow scales / stay replicated;
        # callers tree_map over actual params so absent keys are fine.
        specs["zeros"] = spec2d
        specs["input_perm"] = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        if "input_perm" in params:
            x = jnp.take(x, params["input_perm"], axis=-1)
        K = x.shape[-1]
        kt = select_k_tile(K, self.group_size, self.bits)
        zeros = params.get("zeros")
        bias = params.get("bias")
        if _use_pallas():
            from neural_magic_vllm_tpu import envs
            from neural_magic_vllm_tpu.ops.pallas_quant import \
                quant_matmul_pallas
            # opt-in W4A8: int8-activation MXU dots (2x bf16 rate on real
            # hardware); per-row dynamic act quant changes numerics, so it
            # is gated on an explicit env (accuracy_delta.py measures it)
            act_int8 = bool(envs.NMV_TPU_W4A8) and self.bits == 4 \
                and "input_perm" not in params
            out = quant_matmul_pallas(x, params["qweight"], params["scales"],
                                      zeros, bits=self.bits, k_tile=kt,
                                      group_size=self.group_size, bias=bias,
                                      act_int8=act_int8)
        else:
            out = quant_matmul_ref(x, params["qweight"], params["scales"],
                                   zeros, self.bits, kt, self.group_size,
                                   bias=bias)
        return out.astype(orig_dtype)
