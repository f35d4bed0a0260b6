"""Qwen2 decoder (reference vllm/model_executor/models/qwen2.py):
Llama architecture with QKV biases and optionally tied embeddings."""
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("Qwen2ForCausalLM")
class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias = True
    tie_word_embeddings_default = False
