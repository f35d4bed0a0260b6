"""--sparsity support (the Neural Magic fork flag, reference
vllm/model_executor/layers/sparsity/sparse_w16a16.py:16).

The reference accelerates 2:4 / unstructured sparse W16A16 with the
magic_wand CUDA library. TPUs have no sparse MXU datapath, so sparse
checkpoints execute densely; the value of sparsity on TPU is model-size
reduction via the QUANTIZED paths instead (the reference docs recommend the
same migration). Both sparse formats are accepted and decompressed at load
so sparse checkpoints still serve.
"""
from typing import Any, Dict

from neural_magic_vllm_tpu.layers.linear import UnquantizedLinearMethod
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

logger = init_logger(__name__)


class SparseW16A16Config(QuantizationConfig):
    """sparse_w16a16 / semi_structured_sparse_w16a16: dense execution on
    TPU (no sparse MXU); weights load normally."""

    def __init__(self, name: str = "sparse_w16a16") -> None:
        self._name = name
        logger.warning(
            "sparsity=%s: TPU executes sparse W16A16 densely (no sparse "
            "MXU datapath); consider W4A16/W8A8 quantization instead.",
            name)

    @classmethod
    def get_name(cls) -> str:
        return "sparse_w16a16"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SparseW16A16Config":
        return cls()

    def get_linear_method(self):
        return UnquantizedLinearMethod()
