"""Shared serving logic (reference
vllm/entrypoints/openai/serving_engine.py)."""
from typing import Dict, List, Optional, Union

from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    CompletionLogProbs, ErrorResponse, ModelCard, ModelList)
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.sequence import Logprob

logger = init_logger(__name__)


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model_names: List[str],
                 lora_modules: Optional[List] = None) -> None:
        """``lora_modules``: (name, path) pairs servable by model name
        (reference serving_engine.py LoRAModulePath / --lora-modules)."""
        self.engine = engine
        self.served_model_names = served_model_names
        self.max_model_len = engine.engine.model_config.max_model_len
        self.tokenizer = engine.tokenizer
        self.lora_requests = []
        if lora_modules:
            from neural_magic_vllm_tpu.lora import LoRARequest
            self.lora_requests = [
                LoRARequest(lora_name=name, lora_int_id=i + 1,
                            lora_local_path=path)
                for i, (name, path) in enumerate(lora_modules)
            ]

    async def show_available_models(self) -> ModelList:
        cards = [ModelCard(id=name, root=self.served_model_names[0])
                 for name in self.served_model_names]
        cards += [ModelCard(id=lora.lora_name, root=lora.lora_local_path)
                  for lora in self.lora_requests]
        return ModelList(data=cards)

    def _maybe_get_lora(self, model: Optional[str]):
        """LoRARequest when `model` names a served adapter, else None."""
        for lora in self.lora_requests:
            if model == lora.lora_name:
                return lora
        return None

    def create_error_response(self, message: str,
                              err_type: str = "BadRequestError",
                              status_code: int = 400) -> ErrorResponse:
        return ErrorResponse(message=message, type=err_type,
                             code=status_code)

    def _check_model(self, model: Optional[str]) -> Optional[ErrorResponse]:
        if model is None or model in self.served_model_names:
            return None
        if self._maybe_get_lora(model) is not None:
            return None
        return self.create_error_response(
            f"The model `{model}` does not exist.", "NotFoundError", 404)

    def _validate_prompt_len(self, n_tokens: int,
                             max_tokens: Optional[int]
                             ) -> Optional[ErrorResponse]:
        if n_tokens >= self.max_model_len:
            return self.create_error_response(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens, but the prompt is {n_tokens} "
                f"tokens long.")
        if max_tokens is not None and \
                n_tokens + max_tokens > self.max_model_len:
            return self.create_error_response(
                f"max_tokens ({max_tokens}) + prompt length ({n_tokens}) "
                f"exceeds the model's context length "
                f"({self.max_model_len}).")
        return None

    def _make_logprobs(self, token_ids: List[int],
                       logprobs_list: Optional[List[Dict[int, Logprob]]],
                       num_logprobs: Optional[int],
                       initial_offset: int = 0) -> CompletionLogProbs:
        out = CompletionLogProbs()
        offset = initial_offset
        for tid, lp_dict in zip(token_ids, logprobs_list or []):
            token_text = self.tokenizer.decode([tid]) \
                if self.tokenizer else str(tid)
            out.tokens.append(token_text)
            out.text_offset.append(offset)
            offset += len(token_text)
            if lp_dict is None:
                out.token_logprobs.append(None)
                out.top_logprobs.append(None)
                continue
            chosen = lp_dict.get(tid)
            out.token_logprobs.append(chosen.logprob if chosen else None)
            if num_logprobs:
                top: Dict[str, float] = {}
                for t, lp in lp_dict.items():
                    text = self.tokenizer.decode([t]) \
                        if self.tokenizer else str(t)
                    top[text] = lp.logprob
                out.top_logprobs.append(top)
            else:
                out.top_logprobs.append(None)
        return out

    def _build_guided_processors(self, request):
        """Attach guided-decoding logits processors if requested."""
        from neural_magic_vllm_tpu.guided_decoding import \
            get_guided_decoding_logits_processors
        return get_guided_decoding_logits_processors(request, self.tokenizer)
