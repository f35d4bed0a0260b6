from neural_magic_vllm_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
