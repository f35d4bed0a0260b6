"""HF config loading (analogue of reference vllm/transformers_utils/config.py)."""
from typing import Optional

from transformers import AutoConfig, PretrainedConfig


def get_hf_config(model: str,
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None) -> PretrainedConfig:
    try:
        return AutoConfig.from_pretrained(model,
                                          trust_remote_code=trust_remote_code,
                                          revision=revision)
    except ValueError as e:
        if "trust_remote_code" in str(e):
            raise RuntimeError(
                "The model requires trust_remote_code=True; pass "
                "--trust-remote-code.") from e
        from neural_magic_vllm_tpu.transformers_utils.configs import \
            maybe_custom_config
        cfg = maybe_custom_config(model)
        if cfg is not None:
            return cfg
        raise
