"""Gemma decoder (reference vllm/model_executor/models/gemma.py):
Llama structure with GeGLU MLP, (1+w) RMSNorm convention, sqrt(H)-scaled
embeddings, tied lm_head."""
from neural_magic_vllm_tpu.layers.activation import gelu_and_mul
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("GemmaForCausalLM")
class GemmaForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True
    norm_weight_offset = 1.0
    scale_embeddings = True

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        self.tie_embeddings = True

    def _mlp(self, lp, x, lora_ctx=None):
        gate = self._linear(lp, "gate", x, lora_ctx)
        up = self._linear(lp, "up", x, lora_ctx)
        return self._linear(lp, "down",
                            gelu_and_mul(gate, up, approximate="tanh"),
                            lora_ctx)
