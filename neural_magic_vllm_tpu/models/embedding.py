"""Embedding models (reference vllm/model_executor/models/llama_embedding.py
+ layers/pooler.py): a decoder backbone without lm_head; the pooled
last-token hidden state is the output."""
from typing import Any, Dict

import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("LlamaModel", "MistralModel", "LlamaEmbeddingModel")
class LlamaEmbeddingModel(LlamaForCausalLM):
    """Default pooling type LAST (reference Pooler, pooler.py:56; ALL and
    CLS supported per the reference PoolingType enum — override via the
    checkpoint config's ``pooling_type`` or the model subclass)."""

    is_embedding_model = True
    pooling_type = "LAST"  # one of LAST / ALL / CLS

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None):
        super().__init__(model_config, parallel_config, quant_config)
        override = getattr(model_config.hf_config, "pooling_type", None)
        if override:
            override = str(override).upper()
            if override not in ("LAST", "ALL", "CLS"):
                raise ValueError(
                    f"pooling_type {override!r} not supported "
                    "(LAST / ALL / CLS; reference layers/pooler.py:56)")
            self.pooling_type = override

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
