"""/v1/chat/completions handler (reference
vllm/entrypoints/openai/serving_chat.py)."""
from typing import AsyncIterator, List, Optional

from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionResponseChoice, ChatCompletionStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, DeltaMessage, ErrorResponse,
    FunctionCall, ToolCall, UsageInfo, random_uuid)
from neural_magic_vllm_tpu.entrypoints.openai.serving_engine import \
    OpenAIServing
from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_FALLBACK_TEMPLATE_NOTE = (
    "tokenizer has no chat template; using a generic role-tagged template")


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine, served_model_names,
                 chat_template: Optional[str] = None,
                 lora_modules=None,
                 response_role: str = "assistant") -> None:
        super().__init__(engine, served_model_names,
                         lora_modules=lora_modules)
        self.chat_template = chat_template
        self.response_role = response_role
        if chat_template is not None and self.tokenizer is not None:
            self.tokenizer.chat_template = chat_template

    def _apply_chat_template(self, request: ChatCompletionRequest) -> str:
        messages = request.messages
        tok = self.tokenizer
        template = request.chat_template or \
            getattr(tok, "chat_template", None)
        if tok is not None and template is not None:
            extra = dict(request.chat_template_kwargs or {})
            if request.tools is not None:
                extra["tools"] = [t.model_dump() for t in request.tools]
            if request.documents is not None:
                extra["documents"] = request.documents
            return tok.apply_chat_template(
                messages, tokenize=False,
                add_generation_prompt=request.add_generation_prompt,
                chat_template=request.chat_template, **extra)
        # offline fallback (tiny test tokenizers have no template)
        logger.debug(_FALLBACK_TEMPLATE_NOTE)
        parts = []
        for m in messages:
            parts.append(f"<|{m.get('role', 'user')}|>\n"
                         f"{m.get('content') or ''}")
        if request.add_generation_prompt:
            parts.append("<|assistant|>\n")
        return "\n".join(parts)

    async def create_chat_completion(self, request: ChatCompletionRequest):
        error = self._check_model(request.model)
        if error is not None:
            return error
        try:
            prompt = self._apply_chat_template(request)
            logits_processors = self._build_guided_processors(request)
            logprobs = request.top_logprobs if request.logprobs else None
            sampling_params = request.to_sampling_params(
                logprobs, logits_processors=logits_processors)
        except ValueError as e:
            return self.create_error_response(str(e))

        n_tokens = len(self.tokenizer.encode(prompt)) if self.tokenizer \
            else 0
        if request.truncate_prompt_tokens is not None:
            n_tokens = min(n_tokens, request.truncate_prompt_tokens)
        error = self._validate_prompt_len(n_tokens, request.max_tokens)
        if error is not None:
            return error

        request_id = f"chatcmpl-{random_uuid()}"
        generator = self.engine.generate(prompt=prompt,
                                         sampling_params=sampling_params,
                                         request_id=request_id,
                                         lora_request=self._maybe_get_lora(
                                             request.model))
        if request.stream:
            return await self._stream(request, request_id, generator)
        return await self._full(request, request_id, generator)

    @staticmethod
    def _named_tool(request) -> bool:
        return request.tool_choice is not None and \
            request.tool_choice != "none"

    def _role(self, request) -> str:
        """Reference get_chat_request_role: --response-role when a
        generation prompt is appended, else the last message's role."""
        if request.add_generation_prompt or not request.messages:
            return self.response_role
        return request.messages[-1].get("role", self.response_role)

    def _echo_prefix(self, request, role: str) -> str:
        """Reference serving_chat.py:550-557: with echo, the new message
        is prepended with the last conversation message if it already
        carries the response role."""
        if not request.echo or not request.messages:
            return ""
        last = request.messages[-1]
        if last.get("role") == role and last.get("content"):
            return last["content"]
        return ""

    async def _full(self, request, request_id, generator):
        final = None
        async for output in generator:
            final = output
        assert final is not None
        choices = []
        num_gen = 0
        role = self._role(request)
        echo_prefix = self._echo_prefix(request, role)
        for comp in final.outputs:
            num_gen += len(comp.token_ids)
            logprobs = None
            if request.logprobs:
                logprobs = self._make_logprobs(comp.token_ids,
                                               comp.logprobs,
                                               request.top_logprobs)
            if self._named_tool(request):
                message = ChatMessage(
                    role=role, content="",
                    tool_calls=[ToolCall(function=FunctionCall(
                        name=request.tool_choice.function.name,
                        arguments=comp.text))])
            else:
                message = ChatMessage(role=role,
                                      content=echo_prefix + comp.text)
            choices.append(
                ChatCompletionResponseChoice(
                    index=comp.index,
                    message=message,
                    logprobs=logprobs,
                    finish_reason=comp.finish_reason,
                    stop_reason=comp.stop_reason))
        num_prompt = len(final.prompt_token_ids)
        return ChatCompletionResponse(
            id=request_id, model=request.model, choices=choices,
            usage=UsageInfo(prompt_tokens=num_prompt,
                            completion_tokens=num_gen,
                            total_tokens=num_prompt + num_gen))

    async def _stream(self, request, request_id, generator
                      ) -> AsyncIterator[str]:
        async def gen():
            role = self._role(request)
            first = ChatCompletionStreamResponse(
                id=request_id, model=request.model,
                choices=[
                    ChatCompletionStreamChoice(
                        index=i, delta=DeltaMessage(role=role,
                                                    content=""))
                    for i in range(max(request.n, 1))
                ])
            yield f"data: {first.model_dump_json()}\n\n"
            sent_len = [0] * max(request.n, 1)
            sent_toks = [0] * max(request.n, 1)
            num_prompt = 0
            num_gen = 0
            async for output in generator:
                num_prompt = len(output.prompt_token_ids)
                for comp in output.outputs:
                    delta = comp.text[sent_len[comp.index]:]
                    sent_len[comp.index] = len(comp.text)
                    if not delta and comp.finish_reason is None:
                        continue
                    logprobs = None
                    if request.logprobs and comp.logprobs is not None:
                        lo = sent_toks[comp.index]
                        logprobs = self._make_logprobs(
                            comp.token_ids[lo:], comp.logprobs[lo:],
                            request.top_logprobs)
                    sent_toks[comp.index] = len(comp.token_ids)
                    if self._named_tool(request):
                        dm = DeltaMessage(tool_calls=[
                            ToolCall(function=FunctionCall(
                                name=request.tool_choice.function.name,
                                arguments=delta))
                        ])
                    else:
                        dm = DeltaMessage(content=delta)
                    if comp.finish_reason is not None:
                        num_gen += len(comp.token_ids)
                    chunk = ChatCompletionStreamResponse(
                        id=request_id, model=request.model,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=comp.index,
                                delta=dm,
                                logprobs=logprobs,
                                finish_reason=comp.finish_reason,
                                stop_reason=comp.stop_reason)
                        ])
                    yield f"data: {chunk.model_dump_json()}\n\n"
            if request.stream_options and \
                    request.stream_options.include_usage:
                usage_chunk = ChatCompletionStreamResponse(
                    id=request_id, model=request.model, choices=[],
                    usage=UsageInfo(prompt_tokens=num_prompt,
                                    completion_tokens=num_gen,
                                    total_tokens=num_prompt + num_gen))
                yield f"data: {usage_chunk.model_dump_json()}\n\n"
            yield "data: [DONE]\n\n"

        return gen()
