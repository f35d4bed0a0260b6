from neural_magic_vllm_tpu.multimodal.registry import (MULTIMODAL_REGISTRY,
                                                       MultiModalRegistry)

__all__ = ["MULTIMODAL_REGISTRY", "MultiModalRegistry"]
