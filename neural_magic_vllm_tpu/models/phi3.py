"""Phi-3 decoder (reference vllm/model_executor/models/llama.py handles
Phi3ForCausalLM via fused-projection checkpoints; long context via
Phi3LongRoPE, rotary_embedding.py:432).

Architecture is Llama with fused checkpoint tensors:
  qkv_proj.weight  [ (nh + 2*kvh) * hd, H ]  -> split into q/k/v
  gate_up_proj.weight [ 2*I, H ]             -> split into gate/up
plus longrope (su) scaling handled by layers/rotary.py.
"""
import numpy as np

from neural_magic_vllm_tpu.models import register_model
from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM


@register_model("Phi3ForCausalLM")
class Phi3ForCausalLM(LlamaForCausalLM):

    def _load_into_layers(self, layers, name: str, w, params) -> bool:
        if super()._load_into_layers(layers, name, w, params):
            return True
        if not name.startswith("model.layers."):
            return False
        parts = name.split(".")
        idx = int(parts[2])
        sub = ".".join(parts[3:-1])
        kind = parts[-1]
        layer = layers[idx]
        lm = self.linear_method
        if kind not in lm.hf_param_names:
            return False

        def tr(x):
            return x.T.copy() if (kind in lm.hf_transpose
                                  and x.ndim == 2) else x

        if sub == "self_attn.qkv_proj":
            nh, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
            q, k, v = np.split(w, [nh * hd, (nh + kvh) * hd], axis=0)
            for key, part in (("q", q), ("k", k), ("v", v)):
                layer.setdefault(key, {})[kind] = tr(part)
            return True
        if sub == "mlp.gate_up_proj":
            gate, up = np.split(w, 2, axis=0)
            layer.setdefault("gate", {})[kind] = tr(gate)
            layer.setdefault("up", {})[kind] = tr(up)
            return True
        return False
