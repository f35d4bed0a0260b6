"""Model registry (analogue of reference vllm/model_executor/models/__init__.py)."""
from typing import Type

_MODEL_REGISTRY = {}


def register_model(*architectures):

    def wrap(cls):
        for arch in architectures:
            _MODEL_REGISTRY[arch] = cls
        return cls

    return wrap


def get_model_class(architectures) -> Type:
    # Import model modules lazily so the registry is populated.
    from neural_magic_vllm_tpu.models import llama  # noqa: F401
    from neural_magic_vllm_tpu.models import mixtral  # noqa: F401
    from neural_magic_vllm_tpu.models import qwen2  # noqa: F401
    from neural_magic_vllm_tpu.models import gemma  # noqa: F401
    from neural_magic_vllm_tpu.models import gemma2  # noqa: F401
    from neural_magic_vllm_tpu.models import phi3  # noqa: F401
    from neural_magic_vllm_tpu.models import qwen2_moe  # noqa: F401
    from neural_magic_vllm_tpu.models import deepseek_v2  # noqa: F401
    from neural_magic_vllm_tpu.models import embedding  # noqa: F401
    from neural_magic_vllm_tpu.models import llava  # noqa: F401
    from neural_magic_vllm_tpu.models import jamba  # noqa: F401
    from neural_magic_vllm_tpu.models import llava_next  # noqa: F401
    from neural_magic_vllm_tpu.models import mlp_speculator  # noqa: F401
    from neural_magic_vllm_tpu.models import gpt_family  # noqa: F401
    from neural_magic_vllm_tpu.models import llama_variants  # noqa: F401
    from neural_magic_vllm_tpu.models import minicpm  # noqa: F401
    from neural_magic_vllm_tpu.models import chatglm  # noqa: F401
    from neural_magic_vllm_tpu.models import deepseek  # noqa: F401
    from neural_magic_vllm_tpu.models import arctic  # noqa: F401
    from neural_magic_vllm_tpu.models import phi3_small  # noqa: F401
    from neural_magic_vllm_tpu.models import phi3v  # noqa: F401
    if isinstance(architectures, str):
        architectures = [architectures]
    for arch in architectures:
        if arch in _MODEL_REGISTRY:
            return _MODEL_REGISTRY[arch]
    raise ValueError(
        f"Model architectures {architectures} are not supported. "
        f"Supported: {sorted(_MODEL_REGISTRY)}")
