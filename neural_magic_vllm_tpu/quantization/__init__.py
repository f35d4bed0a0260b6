"""Quantization method registry (reference quantization/__init__.py:22-36).

Detection order: explicit --quantization flag > HF config
``quantization_config`` (or legacy ``quantize_config.json``). Names accepted
mirror the reference registry where the method exists for TPU; marlin names
alias to the same WNA16 fused kernel they are a layout for.
"""
import json
import os
from typing import Any, Dict, Optional, Type

from neural_magic_vllm_tpu.quantization.awq import AWQConfig
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig
from neural_magic_vllm_tpu.quantization.compressed_tensors import \
    CompressedTensorsConfig
from neural_magic_vllm_tpu.quantization.fp8 import Fp8Config
from neural_magic_vllm_tpu.quantization.aqlm import AQLMConfig
from neural_magic_vllm_tpu.quantization.bitsandbytes import \
    BitsAndBytesConfig
from neural_magic_vllm_tpu.quantization.deepspeedfp import DeepSpeedFPConfig
from neural_magic_vllm_tpu.quantization.gptq import GPTQConfig
from neural_magic_vllm_tpu.quantization.marlin_24 import GPTQMarlin24Config
from neural_magic_vllm_tpu.quantization.sparsity import SparseW16A16Config
from neural_magic_vllm_tpu.quantization.squeezellm import SqueezeLLMConfig

QUANTIZATION_METHODS: Dict[str, Type[QuantizationConfig]] = {
    "gptq": GPTQConfig,
    # marlin formats are GPTQ layouts + a repack; we repack to the TPU
    # layout from the GPTQ format directly (reference gptq_marlin.py:131).
    "marlin": GPTQConfig,
    "gptq_marlin": GPTQConfig,
    # 2:4 sparse marlin: compressed values stream from HBM, expanded
    # in-VMEM (ops/sparse24.py)
    "gptq_marlin_24": GPTQMarlin24Config,
    "awq": AWQConfig,
    "fp8": Fp8Config,
    "compressed-tensors": CompressedTensorsConfig,
    "compressed_tensors": CompressedTensorsConfig,
    "sparseml": CompressedTensorsConfig,
    "squeezellm": SqueezeLLMConfig,
    "aqlm": AQLMConfig,
    "deepspeedfp": DeepSpeedFPConfig,
    "bitsandbytes": BitsAndBytesConfig,
    # NM fork --sparsity values (dense execution on TPU; sparsity.py)
    "sparse_w16a16": SparseW16A16Config,
    "semi_structured_sparse_w16a16": SparseW16A16Config,
}


def get_quantization_config(name: str) -> Type[QuantizationConfig]:
    if name not in QUANTIZATION_METHODS:
        raise ValueError(
            f"unknown quantization method {name!r}; "
            f"supported: {sorted(set(QUANTIZATION_METHODS))}")
    return QUANTIZATION_METHODS[name]


def _read_hf_quant_config(model_config) -> Optional[Dict[str, Any]]:
    hf_cfg = getattr(model_config, "hf_config", None)
    qc = getattr(hf_cfg, "quantization_config", None)
    if qc is not None:
        return dict(qc)
    # legacy AutoGPTQ side file
    model_dir = model_config.model
    if isinstance(model_dir, str) and os.path.isdir(model_dir):
        path = os.path.join(model_dir, "quantize_config.json")
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
            cfg.setdefault("quant_method", "gptq")
            return cfg
    return None


def create_quant_config(model_config) -> Optional[QuantizationConfig]:
    """Resolve the quantization config for a model: explicit flag wins,
    otherwise auto-detect from the checkpoint (reference
    config.py _verify_quantization + gptq_marlin auto-override)."""
    sparsity = getattr(model_config, "sparsity", None)
    if sparsity:
        return SparseW16A16Config(sparsity)
    name = getattr(model_config, "quantization", None)
    hf_quant = _read_hf_quant_config(model_config)
    # marlin_24 serialization auto-override: GPTQ checkpoints whose
    # checkpoint_format is marlin_24 carry 2:4-compressed tensors
    # (reference gptq_marlin_24.py override_quantization_method:96-110)
    if (hf_quant is not None
            and hf_quant.get("checkpoint_format") == "marlin_24"
            and name in (None, "gptq", "gptq_marlin_24")):
        name = "gptq_marlin_24"
    if name is None:
        if hf_quant is None:
            return None
        name = str(hf_quant.get("quant_method", "")).lower()
        if name not in QUANTIZATION_METHODS:
            raise ValueError(f"checkpoint quant_method {name!r} unsupported")
    cls = get_quantization_config(name)
    if hf_quant is not None:
        return cls.from_config(hf_quant)
    # flag without checkpoint config: sensible defaults (dummy/bench loads)
    if cls is GPTQConfig:
        return GPTQConfig(bits=4, group_size=128, desc_act=False)
    if cls is GPTQMarlin24Config:
        return GPTQMarlin24Config(bits=4, group_size=128)
    if cls is AWQConfig:
        return AWQConfig(bits=4, group_size=128, zero_point=True)
    if cls is Fp8Config:
        return Fp8Config()
    if cls is CompressedTensorsConfig:
        return CompressedTensorsConfig("w8a8")
    if cls is SqueezeLLMConfig:
        return SqueezeLLMConfig(weight_bits=4)
    return cls.from_config({})
