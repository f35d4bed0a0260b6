"""Linear layers and the quantization seam.

The reference routes every linear through LinearMethodBase.create_weights/
apply (vllm/model_executor/layers/linear.py:69) — the single seam all
quantization plugs into. Same design here: a LinearMethod owns the parameter
layout and the matmul; TP sharding is expressed as a PartitionSpec per
parameter (consumed by the loader / jit in parallel/mesh.py) instead of the
reference's per-shard weight_loader narrowing.

Weights are stored [in_features, out_features] so the forward is x @ W —
contraction on the leading axis feeds the MXU without a transpose.
"""
from typing import Any, Dict, Optional, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


class LinearMethod:
    """Strategy interface (reference LinearMethodBase, linear.py:69)."""

    # HF checkpoint tensor suffixes this method consumes for one linear
    # (e.g. GPTQ: qweight/qzeros/scales/g_idx), and which of those the
    # loader should transpose to in-first orientation.
    hf_param_names: Tuple[str, ...] = ("weight", "bias")
    hf_transpose: Tuple[str, ...] = ("weight", )

    def create_params(self, rng: np.random.Generator, in_features: int,
                      out_features: int, use_bias: bool) -> Dict[str, Any]:
        """Host-side (numpy) random init; dtype cast happens at device_put."""
        raise NotImplementedError

    def param_specs(self, partition: str,
                    use_bias: bool) -> Dict[str, P]:
        raise NotImplementedError

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Raw HF tensors (post-transpose) -> canonical device params."""
        return raw

    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        raise NotImplementedError

    # Output-axis concat rule per canonical param key; methods whose
    # canonical params follow these rules can fuse several same-input
    # linears (qkv, gate_up) into ONE kernel dispatch — the TPU analogue of
    # the reference's MergedColumnParallel/QKVParallelLinear (linear.py:
    # 341,490), motivated here by per-dispatch overhead, not TP loading.
    _MERGE_AXIS = {"weight": 1, "qweight": 1, "scales": 1, "zeros": 1,
                   "bias": 0}

    def merge_params(self, parts) -> Optional[Dict[str, Any]]:
        """Concatenate canonical param dicts along the output axis, or
        None when this method/these params cannot be merged (per-tensor
        scales, act-order input permutations, unknown keys)."""
        keys = set(parts[0])
        if any(set(p) != keys for p in parts):
            return None
        if not keys.issubset(self._MERGE_AXIS):
            return None  # e.g. input_perm (act-order), codebooks
        return {
            k: np.concatenate([np.asarray(p[k]) for p in parts],
                              axis=self._MERGE_AXIS[k])
            for k in keys
        }


class UnquantizedLinearMethod(LinearMethod):
    """bf16/fp32 dense matmul (reference UnquantizedLinearMethod,
    linear.py:103)."""

    def create_params(self, rng, in_features, out_features, use_bias):
        scale = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-scale, scale,
                        (in_features, out_features)).astype(np.float32)
        params = {"weight": w}
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        # "column": output dim sharded over the model axis (q/k/v/gate/up).
        # "row": input dim sharded (o_proj/down_proj) -> psum after matmul,
        # inserted by GSPMD from the shardings.
        if partition == "column":
            specs = {"weight": P(None, "model")}
            bias_spec = P("model")
        elif partition == "row":
            specs = {"weight": P("model", None)}
            bias_spec = P(None)
        else:  # replicated
            specs = {"weight": P(None, None)}
            bias_spec = P(None)
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params, x):
        out = jnp.dot(x, params["weight"],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"]
        return out


def get_linear_method(quant_config: Optional[Any]) -> LinearMethod:
    if quant_config is None:
        return UnquantizedLinearMethod()
    return quant_config.get_linear_method()
