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


class ChatGLMConfig(PretrainedConfig):
    """ChatGLM2/3 / GLM-4 config (reference
    vllm/transformers_utils/configs/chatglm.py), normalized to llama-style
    attribute names for the shared decoder base."""

    model_type = "chatglm"

    def __init__(self, num_layers: int = 28, padded_vocab_size: int = 65024,
                 hidden_size: int = 4096, ffn_hidden_size: int = 13696,
                 kv_channels: int = 128, num_attention_heads: int = 32,
                 seq_length: int = 2048, layernorm_epsilon: float = 1e-5,
                 rmsnorm: bool = True,
                 apply_residual_connection_post_layernorm: bool = False,
                 add_bias_linear: bool = False, add_qkv_bias: bool = False,
                 multi_query_attention: bool = False,
                 multi_query_group_num: int = 1, rope_ratio: float = 1.0,
                 **kwargs) -> None:
        self.num_layers = num_layers
        self.num_hidden_layers = num_layers
        self.vocab_size = padded_vocab_size
        self.padded_vocab_size = padded_vocab_size
        self.hidden_size = hidden_size
        self.ffn_hidden_size = ffn_hidden_size
        self.intermediate_size = ffn_hidden_size
        self.kv_channels = kv_channels
        self.head_dim = kv_channels
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (multi_query_group_num
                                    if multi_query_attention
                                    else num_attention_heads)
        self.multi_query_attention = multi_query_attention
        self.multi_query_group_num = multi_query_group_num
        self.seq_length = seq_length
        self.max_position_embeddings = seq_length
        self.layernorm_epsilon = layernorm_epsilon
        self.rms_norm_eps = layernorm_epsilon
        self.rmsnorm = rmsnorm
        self.apply_residual_connection_post_layernorm = \
            apply_residual_connection_post_layernorm
        self.add_bias_linear = add_bias_linear
        self.add_qkv_bias = add_qkv_bias
        self.rope_ratio = rope_ratio
        self.rope_theta = 10000.0 * rope_ratio
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(**kwargs)


class JAISConfig(PretrainedConfig):
    """JAIS (reference vllm/transformers_utils/configs/jais.py): GPT-2
    style field names + muP scaling knobs."""

    model_type = "jais"
    attribute_map = {
        "hidden_size": "n_embd",
        "num_attention_heads": "n_head",
        "num_hidden_layers": "n_layer",
        "max_position_embeddings": "n_positions",
    }

    def __init__(self, vocab_size: int = 84992, n_positions: int = 2048,
                 n_embd: int = 2560, n_layer: int = 32, n_head: int = 20,
                 n_inner=None, activation_function: str = "swiglu",
                 layer_norm_epsilon: float = 1e-5,
                 position_embedding_type: str = "alibi",
                 mup_width_scale: float = 1.0,
                 mup_embeddings_scale: float = 1.0,
                 mup_output_alpha: float = 1.0,
                 mup_scale_qk_dot_by_d: bool = False, **kwargs) -> None:
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_inner = n_inner
        self.activation_function = activation_function
        self.layer_norm_epsilon = layer_norm_epsilon
        self.position_embedding_type = position_embedding_type
        self.mup_width_scale = mup_width_scale
        self.mup_embeddings_scale = mup_embeddings_scale
        self.mup_output_alpha = mup_output_alpha
        self.mup_scale_qk_dot_by_d = mup_scale_qk_dot_by_d
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(**kwargs)


class Phi3VConfig(PretrainedConfig):
    """Phi-3-Vision (remote-code model_type "phi3_v"): phi3-style text
    fields at top level plus img_processor/embd_layer dicts. Synthesizes
    the fixed CLIP ViT-L/14-336 vision_config (reference phi3v.py:60-69)
    and the hardcoded image token id 32044 (phi3v.py:54) so the shared
    multimodal machinery can treat it like any vision-language model."""

    model_type = "phi3_v"

    def __init__(self, img_processor=None, embd_layer=None,
                 num_crops: int = 16, vision_config=None, **kwargs) -> None:
        kwargs.setdefault("hidden_size", 3072)
        kwargs.setdefault("num_hidden_layers", 32)
        kwargs.setdefault("num_attention_heads", 32)
        kwargs.setdefault("vocab_size", 32064)
        kwargs.setdefault("intermediate_size", 8192)
        super().__init__(**kwargs)
        for k, v in kwargs.items():
            if not hasattr(self, k):
                setattr(self, k, v)
        self.img_processor = img_processor or {}
        self.embd_layer = embd_layer or {
            "embedding_cls": "image", "hd_transform_order": "glb_sub",
            "use_hd_transform": True, "with_learnable_separator": True}
        self.num_crops = num_crops
        if not hasattr(self, "image_token_index"):
            self.image_token_index = 32044
        from transformers import CLIPVisionConfig
        if isinstance(vision_config, dict):
            self.vision_config = CLIPVisionConfig(**vision_config)
        elif vision_config is not None:
            self.vision_config = vision_config
        else:
            self.vision_config = CLIPVisionConfig(
                dropout=0.0, hidden_size=1024, image_size=336,
                intermediate_size=4096, num_attention_heads=16,
                num_channels=3, num_hidden_layers=24, patch_size=14,
                projection_dim=768)


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
    "chatglm": ChatGLMConfig,
    "jais": JAISConfig,
    "deepseek": LlamaLikeConfig,
    "arctic": LlamaLikeConfig,
    "phi3small": LlamaLikeConfig,
    "phi3_v": Phi3VConfig,
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
