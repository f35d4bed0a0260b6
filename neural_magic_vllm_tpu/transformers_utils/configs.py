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


_CUSTOM_CONFIGS = {
    "mlp_speculator": MLPSpeculatorConfig,
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
    raw.pop("architectures", None)
    return cls(**{k: v for k, v in raw.items() if k != "model_type"})
