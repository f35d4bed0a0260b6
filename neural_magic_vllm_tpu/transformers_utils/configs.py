"""Custom model configs absent from HF transformers (reference
vllm/transformers_utils/configs/)."""
from transformers import PretrainedConfig


class MLPSpeculatorConfig(PretrainedConfig):
    """IBM MLPSpeculator (reference
    vllm/transformers_utils/configs/mlp_speculator.py)."""

    model_type = "mlp_speculator"

    def __init__(self, vocab_size: int = 32000, emb_dim: int = 4096,
                 inner_dim: int = 0, n_predict: int = 3, top_k_tokens_per_head=None,
                 n_candidates: int = 5, tie_weights: bool = False,
                 scale_input: bool = False, **kwargs) -> None:
        self.vocab_size = vocab_size
        self.emb_dim = emb_dim
        self.inner_dim = inner_dim
        self.n_predict = n_predict
        self.top_k_tokens_per_head = top_k_tokens_per_head or [1] * n_predict
        self.n_candidates = n_candidates
        self.tie_weights = tie_weights
        self.scale_input = scale_input
        self.num_lookahead_tokens = n_predict
        self.architectures = ["MLPSpeculatorPreTrainedModel"]
        super().__init__(**kwargs)


class LlamaLikeConfig(PretrainedConfig):
    """Generic config for llama-shaped remote-code architectures
    (baichuan, internlm/2, aquila, xverse, orion, …): PretrainedConfig
    stores every checkpoint field as an attribute, which is all the
    llama-family model classes need."""

    def __init__(self, **kwargs) -> None:
        kwargs.setdefault("hidden_size", 4096)
        kwargs.setdefault("num_hidden_layers", 32)
        kwargs.setdefault("num_attention_heads", 32)
        kwargs.setdefault("vocab_size", 32000)
        kwargs.setdefault("intermediate_size", 11008)
        super().__init__(**kwargs)
        for k, v in kwargs.items():
            if not hasattr(self, k):
                setattr(self, k, v)


_CUSTOM_CONFIGS = {
    "mlp_speculator": MLPSpeculatorConfig,
    "baichuan": LlamaLikeConfig,
    "internlm": LlamaLikeConfig,
    "internlm2": LlamaLikeConfig,
    "aquila": LlamaLikeConfig,
    "xverse": LlamaLikeConfig,
    "orion": LlamaLikeConfig,
    "qwen": LlamaLikeConfig,
    "deci": LlamaLikeConfig,
    "minicpm": LlamaLikeConfig,
}


def maybe_custom_config(model_dir: str):
    """Build a config from the custom registry when AutoConfig does not
    recognize model_type; None if not ours."""
    import json
    import os
    path = os.path.join(model_dir, "config.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    cls = _CUSTOM_CONFIGS.get(raw.get("model_type"))
    if cls is None:
        return None
    archs = raw.pop("architectures", None)
    cfg = cls(**{k: v for k, v in raw.items() if k != "model_type"})
    if archs and not getattr(cfg, "architectures", None):
        cfg.architectures = archs
    return cfg
