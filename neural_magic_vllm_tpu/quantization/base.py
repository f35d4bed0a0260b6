"""Quantization config interface (reference
vllm/model_executor/layers/quantization/base_config.py).

A QuantizationConfig is detected from the checkpoint's HF config (or forced
via --quantization), validates compatibility, and hands out the LinearMethod
that owns parameter layout + matmul for every linear in the model — the
single seam design of the reference (linear.py:69).
"""
from typing import Any, Dict, List, Optional


class QuantizationConfig:
    """Base class for all quantization configs."""

    @classmethod
    def get_name(cls) -> str:
        raise NotImplementedError

    @classmethod
    def get_supported_act_dtypes(cls) -> List[str]:
        return ["bfloat16", "float32"]

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "QuantizationConfig":
        raise NotImplementedError

    @classmethod
    def override_quantization_method(cls, hf_quant_cfg: Dict[str, Any],
                                     user_quant: Optional[str]
                                     ) -> Optional[str]:
        """Let a method claim a checkpoint quantized for another method
        (reference gptq_marlin.py:131: GPTQ checkpoints auto-upgrade to the
        marlin-style fused kernel)."""
        return None

    def get_linear_method(self):
        raise NotImplementedError

    def get_kv_cache_scales(self) -> Optional[Dict[str, float]]:
        return None

    @staticmethod
    def get_from_keys(config: Dict[str, Any], keys: List[str]) -> Any:
        for key in keys:
            if key in config:
                return config[key]
        raise ValueError(f"none of {keys} found in quantization config")
