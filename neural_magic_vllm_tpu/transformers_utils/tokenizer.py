"""Tokenizer loading (reference vllm/transformers_utils/tokenizer.py)."""
from typing import Optional, Union

from transformers import (AutoTokenizer, PreTrainedTokenizer,
                          PreTrainedTokenizerFast)

AnyTokenizer = Union[PreTrainedTokenizer, PreTrainedTokenizerFast]


def get_tokenizer(tokenizer_name: str,
                  tokenizer_mode: str = "auto",
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None,
                  **kwargs) -> AnyTokenizer:
    if tokenizer_mode == "slow":
        kwargs["use_fast"] = False
    tok = AutoTokenizer.from_pretrained(tokenizer_name,
                                        trust_remote_code=trust_remote_code,
                                        revision=revision,
                                        **kwargs)
    if not isinstance(tok, PreTrainedTokenizerFast) \
            and tokenizer_mode == "auto":
        pass  # slow tokenizer is acceptable; fast preferred
    return tok
