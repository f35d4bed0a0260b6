"""--sparsity support (the Neural Magic fork flag, reference
vllm/model_executor/layers/sparsity/sparse_w16a16.py:16,
semi_structured_sparse_w16a16.py:13).

The reference accelerates sparse W16A16 with the magic_wand CUDA library.
TPUs have no sparse MXU datapath, so the TPU-native win is HBM bandwidth,
not FLOPs: for **2:4 semi-structured** checkpoints the weights stay
compressed in HBM (half the values + 4-bit position codes per quadruple)
and are expanded in VMEM by the Pallas kernel (ops/sparse24.py) before a
dense MXU dot — halving the weight streaming that bounds decode.
**Unstructured** sparse_w16a16 has no streamable compressed form without
gather hardware and executes densely (the reference docs recommend
migrating such checkpoints to the quantized paths).
"""
from typing import Any, Dict

import numpy as np

from neural_magic_vllm_tpu.layers.linear import (LinearMethod,
                                                 UnquantizedLinearMethod)
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

logger = init_logger(__name__)


class Sparse24W16A16LinearMethod(LinearMethod):
    """semi_structured_sparse_w16a16: bf16 values compressed 2:4 in HBM.

    Falls back to dense storage per-linear when the checkpoint tensor is
    not actually 2:4 structured or K has no valid tile, so mixed / sloppy
    checkpoints still serve."""

    hf_param_names = ("weight", "bias")
    hf_transpose = ("weight", )

    _MERGE_AXIS = {"vals": 1, "meta": 1, "weight": 1, "bias": 0}

    def _try_compress(self, w: np.ndarray) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.ops.sparse24 import (pack_sparse24_bf16,
                                                        select_k_tile_24)
        K = w.shape[0]
        try:
            kt = select_k_tile_24(K, -1)
            vals, meta = pack_sparse24_bf16(w, kt)
        except ValueError as e:
            logger.warning(
                "semi_structured_sparse_w16a16: dense fallback for a "
                "[%d, %d] linear (%s)", w.shape[0], w.shape[1], e)
            return {"weight": w.astype(np.float32)}
        return {"vals": vals, "meta": meta}

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = self._try_compress(np.asarray(raw["weight"], np.float32))
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def create_params(self, rng, in_features, out_features, use_bias):
        """Random 2:4-sparse dense init (dummy load format)."""
        scale = 1.0 / np.sqrt(in_features)
        w = rng.uniform(-scale, scale,
                        (in_features, out_features)).astype(np.float32)
        quads = w.reshape(in_features // 4, 4, out_features)
        # zero the two smallest-magnitude entries of each quadruple
        order = np.argsort(np.abs(quads), axis=1)
        np.put_along_axis(quads, order[:, :2, :], 0.0, axis=1)
        params = self._try_compress(quads.reshape(in_features, out_features))
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        from jax.sharding import PartitionSpec as P
        if partition == "column":
            spec2d, bias_spec = P(None, "model"), P("model")
        elif partition == "row":
            spec2d, bias_spec = P("model", None), P(None)
        else:
            spec2d, bias_spec = P(None, None), P(None)
        specs = {"vals": spec2d, "meta": spec2d, "weight": spec2d}
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params: Dict[str, Any], x):
        import jax
        import jax.numpy as jnp
        if "weight" in params:  # dense fallback
            out = jnp.dot(x, params["weight"].astype(x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype)
            if "bias" in params:
                out = out + params["bias"].astype(out.dtype)
            return out
        from neural_magic_vllm_tpu import envs
        from neural_magic_vllm_tpu.ops.sparse24 import (
            select_k_tile_24, sparse24_bf16_matmul_ref,
            sparse24_matmul_pallas)
        K = x.shape[-1]
        kt = select_k_tile_24(K, -1)
        bias = params.get("bias")
        override = envs.NMV_TPU_QUANT_BACKEND
        use_pallas = override == "pallas" if override is not None else \
            jax.default_backend() in ("tpu", "axon")
        if use_pallas:
            return sparse24_matmul_pallas(x, params["vals"].astype(
                jnp.bfloat16), params["meta"], None, bits=None, k_tile=kt,
                                          group_size=-1, bias=bias)
        # expansion is an exact selection, so in the reference path the
        # values stay at the activation dtype (f32 engines match dense
        # execution bit-for-bit)
        return sparse24_bf16_matmul_ref(x, params["vals"].astype(x.dtype),
                                        params["meta"], kt, bias=bias)

    def merge_params(self, parts):
        keys = set(parts[0])
        if any(set(p) != keys for p in parts):
            return None  # mixed compressed/dense fallback linears
        return super().merge_params(parts)


class SparseW16A16Config(QuantizationConfig):
    """sparse_w16a16 (unstructured -> dense execution) /
    semi_structured_sparse_w16a16 (2:4 -> compressed HBM datapath)."""

    def __init__(self, name: str = "sparse_w16a16") -> None:
        self._name = name
        if name == "semi_structured_sparse_w16a16":
            logger.info(
                "sparsity=%s: weights stored 2:4-compressed in HBM "
                "(halved weight streaming), expanded in-kernel.", name)
        else:
            logger.warning(
                "sparsity=%s: TPU executes unstructured sparse W16A16 "
                "densely (no sparse MXU datapath); consider W4A16/W8A8 "
                "quantization or 2:4 semi-structured instead.", name)

    @classmethod
    def get_name(cls) -> str:
        return "sparse_w16a16"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SparseW16A16Config":
        return cls()

    def get_linear_method(self):
        if self._name == "semi_structured_sparse_w16a16":
            return Sparse24W16A16LinearMethod()
        return UnquantizedLinearMethod()
