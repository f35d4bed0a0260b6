"""Embedding models (reference vllm/model_executor/models/llama_embedding.py
+ layers/pooler.py): a decoder backbone without lm_head; the pooled
last-token hidden state is the output."""
from typing import Any, Dict

import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("LlamaModel", "MistralModel", "LlamaEmbeddingModel")
class LlamaEmbeddingModel(LlamaForCausalLM):
    """Pooling type LAST (reference Pooler, pooler.py:56)."""

    is_embedding_model = True

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        # bare-backbone checkpoints drop the "model." prefix
        if not name.startswith("model.") and not name.startswith("lm_head"):
            name = "model." + name
        return super()._load_into_layers(layers, name, w, params)

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        params = super().load_params(model_dir)
        return params

    def pool(self, hidden, last_index: int):
        """hidden [S, H] -> the last REAL token's hidden state."""
        return hidden[last_index]
