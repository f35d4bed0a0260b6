"""/v1/completions handler (reference
vllm/entrypoints/openai/serving_completion.py)."""
import asyncio
from typing import AsyncIterator, List, Optional, Union

from neural_magic_vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionStreamResponse, ErrorResponse, UsageInfo, random_uuid)
from neural_magic_vllm_tpu.entrypoints.openai.serving_engine import \
    OpenAIServing
from neural_magic_vllm_tpu.outputs import RequestOutput


def _as_prompt_lists(prompt) -> List[Union[str, List[int]]]:
    """Normalize the 4 accepted prompt forms into a list of prompts."""
    if isinstance(prompt, str):
        return [prompt]
    if isinstance(prompt, list):
        if not prompt:
            raise ValueError("empty prompt")
        if isinstance(prompt[0], int):
            return [prompt]
        return list(prompt)
    raise ValueError("invalid prompt type")


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(self, request: CompletionRequest):
        error = self._check_model(request.model)
        if error is not None:
            return error
        if request.suffix is not None:
            # reference serving_completion.py:92: causal LMs have no
            # fill-in-the-middle path
            return self.create_error_response(
                "suffix is not currently supported")
        if request.echo and request.stream:
            return self.create_error_response(
                "echo is not supported with streaming")
        try:
            prompts = _as_prompt_lists(request.prompt)
            logits_processors = self._build_guided_processors(request)
            sampling_params = request.to_sampling_params(
                request.logprobs, logits_processors=logits_processors)
        except ValueError as e:
            return self.create_error_response(str(e))

        request_id = f"cmpl-{random_uuid()}"
        generators: List[AsyncIterator[RequestOutput]] = []
        for i, prompt in enumerate(prompts):
            if isinstance(prompt, str):
                kwargs = {"prompt": prompt, "prompt_token_ids": None}
                n_tokens = len(self.tokenizer.encode(prompt)) \
                    if self.tokenizer else 0
            else:
                kwargs = {"prompt": None, "prompt_token_ids": prompt}
                n_tokens = len(prompt)
            if request.truncate_prompt_tokens is not None:
                n_tokens = min(n_tokens, request.truncate_prompt_tokens)
            error = self._validate_prompt_len(n_tokens, request.max_tokens)
            if error is not None:
                return error
            generators.append(
                self.engine.generate(sampling_params=sampling_params,
                                     request_id=f"{request_id}-{i}",
                                     lora_request=self._maybe_get_lora(
                                         request.model),
                                     **kwargs))

        if request.stream:
            return await self._stream_generator(request, request_id,
                                                generators)
        return await self._full_generator(request, request_id, generators)

    async def _full_generator(self, request, request_id, generators):
        choices: List[CompletionResponseChoice] = []
        num_prompt = 0
        num_gen = 0
        finals: List[Optional[RequestOutput]] = [None] * len(generators)
        for i, gen in enumerate(generators):
            async for output in gen:
                finals[i] = output
        for i, output in enumerate(finals):
            assert output is not None
            num_prompt += len(output.prompt_token_ids)
            for comp in output.outputs:
                num_gen += len(comp.token_ids)
                text = comp.text
                if request.echo:
                    text = (output.prompt or "") + text
                logprobs = None
                if request.logprobs is not None:
                    logprobs = self._make_logprobs(comp.token_ids,
                                                   comp.logprobs,
                                                   request.logprobs)
                choices.append(
                    CompletionResponseChoice(
                        index=i * max(request.n, 1) + comp.index,
                        text=text, logprobs=logprobs,
                        finish_reason=comp.finish_reason,
                        stop_reason=comp.stop_reason))
        return CompletionResponse(
            id=request_id, model=request.model, choices=choices,
            usage=UsageInfo(prompt_tokens=num_prompt,
                            completion_tokens=num_gen,
                            total_tokens=num_prompt + num_gen))

    async def _stream_one(self, request, request_id, i, gen, queue,
                          usage_acc):
        sent_len = [0] * max(request.n, 1)
        sent_toks = [0] * max(request.n, 1)
        try:
            async for output in gen:
                usage_acc["prompts"][i] = len(output.prompt_token_ids)
                for comp in output.outputs:
                    delta = comp.text[sent_len[comp.index]:]
                    sent_len[comp.index] = len(comp.text)
                    if comp.finish_reason is not None:
                        usage_acc["completion"] += len(comp.token_ids)
                    if not delta and comp.finish_reason is None:
                        continue
                    logprobs = None
                    if request.logprobs is not None and \
                            comp.logprobs is not None:
                        lo = sent_toks[comp.index]
                        logprobs = self._make_logprobs(
                            comp.token_ids[lo:], comp.logprobs[lo:],
                            request.logprobs)
                    sent_toks[comp.index] = len(comp.token_ids)
                    chunk = CompletionStreamResponse(
                        id=request_id, model=request.model,
                        choices=[
                            CompletionResponseChoice(
                                index=i * max(request.n, 1) + comp.index,
                                text=delta,
                                logprobs=logprobs,
                                finish_reason=comp.finish_reason,
                                stop_reason=comp.stop_reason)
                        ])
                    await queue.put(chunk.model_dump_json(
                        exclude_unset=False))
        except Exception as e:  # noqa: BLE001
            await queue.put(e)

    async def _stream_generator(self, request, request_id, generators
                                ) -> AsyncIterator[str]:
        queue: asyncio.Queue = asyncio.Queue()
        usage_acc = {"completion": 0, "prompts": {}}
        tasks = [
            asyncio.ensure_future(
                self._stream_one(request, request_id, i, gen, queue,
                                 usage_acc))
            for i, gen in enumerate(generators)
        ]
        _done = object()

        async def pump():
            await asyncio.gather(*tasks, return_exceptions=True)
            await queue.put(_done)

        pump_task = asyncio.ensure_future(pump())

        async def gen() -> AsyncIterator[str]:
            try:
                while True:
                    item = await queue.get()
                    if item is _done:
                        break
                    if isinstance(item, Exception):
                        raise item
                    yield f"data: {item}\n\n"
                if request.stream_options and \
                        request.stream_options.include_usage:
                    num_prompt = sum(usage_acc["prompts"].values())
                    num_gen = usage_acc["completion"]
                    usage_chunk = CompletionStreamResponse(
                        id=request_id, model=request.model, choices=[],
                        usage=UsageInfo(
                            prompt_tokens=num_prompt,
                            completion_tokens=num_gen,
                            total_tokens=num_prompt + num_gen))
                    yield f"data: {usage_chunk.model_dump_json()}\n\n"
                yield "data: [DONE]\n\n"
            finally:
                pump_task.cancel()
                for t in tasks:
                    t.cancel()

        return gen()
