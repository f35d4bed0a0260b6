"""ChatGLM2/3 & GLM-4 decoder (reference
vllm/model_executor/models/chatglm.py): llama-style swiglu decoder with a
fused biased query_key_value projection (MQA via multi_query_group_num),
partial GPT-J-style rotary over head_dim//2 channels with base
10000*rope_ratio (chatglm.py:84-90), RMSNorm, and a fused
dense_h_to_4h = [gate; up] MLP (chatglm.py:137-144). Config fields are
normalized to llama names by ChatGLMConfig
(transformers_utils/configs.py)."""
from typing import Any, Dict, List

import numpy as np

from neural_magic_vllm_tpu.layers.rotary import get_rope
from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("ChatGLMModel", "ChatGLMForConditionalGeneration",
                "ChatGLMForCausalLM")
class ChatGLMForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_text_config
        if not getattr(cfg, "rmsnorm", True):
            raise NotImplementedError("ChatGLM v1 (LayerNorm) not supported")
        if getattr(cfg, "apply_residual_connection_post_layernorm", False):
            raise NotImplementedError(
                "apply_residual_connection_post_layernorm not supported")
        super().__init__(model_config, parallel_config, quant_config)
        self.qkv_bias = bool(
            getattr(cfg, "add_qkv_bias", False)
            or getattr(cfg, "add_bias_linear", False))
        # partial interleaved rotary (reference chatglm.py:84-90)
        self.rope = get_rope(self.head_dim, self.head_dim // 2,
                             getattr(cfg, "seq_length", 2048),
                             self.rope_theta, False, None)

    def _load_into_layers(self, layers: List[Dict], name: str, w,
                          params: Dict[str, Any]) -> bool:
        if name == "transformer.embedding.word_embeddings.weight":
            params["embed"] = w
            return True
        if name == "transformer.output_layer.weight":
            params["lm_head"] = w.T.copy()
            return True
        if name == "transformer.encoder.final_layernorm.weight":
            params["final_norm"] = w
            return True
        if "rotary_pos_emb" in name:
            return True
        if not name.startswith("transformer.encoder.layers."):
            return False
        parts = name.split(".")
        layer = layers[int(parts[3])]
        sub = ".".join(parts[4:-1])
        kind = parts[-1]
        nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        if sub == "input_layernorm":
            layer["input_norm"] = w
        elif sub == "post_attention_layernorm":
            layer["post_norm"] = w
        elif sub == "self_attention.query_key_value":
            qs, ks = nh * hd, kvh * hd
            for tgt, sl in (("q", slice(0, qs)), ("k", slice(qs, qs + ks)),
                            ("v", slice(qs + ks, qs + 2 * ks))):
                part = w[sl]
                layer.setdefault(tgt, {})[kind] = \
                    part.T.copy() if part.ndim == 2 else part
        elif sub == "self_attention.dense":
            layer.setdefault("o", {})[kind] = \
                w.T.copy() if w.ndim == 2 else w
        elif sub == "mlp.dense_h_to_4h":
            I = self.intermediate_size
            for tgt, sl in (("gate", slice(0, I)), ("up", slice(I, 2 * I))):
                part = w[sl]
                layer.setdefault(tgt, {})[kind] = \
                    part.T.copy() if part.ndim == 2 else part
        elif sub == "mlp.dense_4h_to_h":
            layer.setdefault("down", {})[kind] = \
                w.T.copy() if w.ndim == 2 else w
        else:
            return False
        return True
