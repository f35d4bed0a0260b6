"""Offline batched-inference API (reference vllm/entrypoints/llm.py:24)."""
from typing import List, Optional, Union

from tqdm import tqdm

from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
from neural_magic_vllm_tpu.outputs import RequestOutput
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.utils import Counter


class LLM:
    """Offline inference over a list of prompts with continuous batching."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        skip_tokenizer_init: bool = False,
        trust_remote_code: bool = False,
        tensor_parallel_size: int = 1,
        dtype: str = "auto",
        quantization: Optional[str] = None,
        revision: Optional[str] = None,
        seed: int = 0,
        gpu_memory_utilization: float = 0.9,
        swap_space: float = 4.0,
        enforce_eager: bool = False,
        max_model_len: Optional[int] = None,
        block_size: int = 16,
        enable_prefix_caching: bool = False,
        enable_chunked_prefill: bool = False,
        max_num_seqs: int = 256,
        max_num_batched_tokens: Optional[int] = None,
        kv_cache_dtype: str = "auto",
        num_gpu_blocks_override: Optional[int] = None,
        disable_log_stats: bool = True,
        **kwargs,
    ) -> None:
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer,
            tokenizer_mode=tokenizer_mode,
            skip_tokenizer_init=skip_tokenizer_init,
            trust_remote_code=trust_remote_code,
            tensor_parallel_size=tensor_parallel_size,
            dtype=dtype,
            quantization=quantization,
            revision=revision,
            seed=seed,
            gpu_memory_utilization=gpu_memory_utilization,
            swap_space=swap_space,
            enforce_eager=enforce_eager,
            max_model_len=max_model_len,
            block_size=block_size,
            enable_prefix_caching=enable_prefix_caching,
            enable_chunked_prefill=enable_chunked_prefill,
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            kv_cache_dtype=kv_cache_dtype,
            num_gpu_blocks_override=num_gpu_blocks_override,
            disable_log_stats=disable_log_stats,
            **kwargs,
        )
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = True,
        lora_request=None,
        multi_modal_data=None,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids must be "
                             "provided.")
        if isinstance(prompts, str):
            prompts = [prompts]
        num_requests = len(prompts) if prompts is not None else len(
            prompt_token_ids)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * num_requests
        if len(sampling_params) != num_requests:
            raise ValueError(
                "sampling_params must match the number of prompts.")
        if multi_modal_data is not None and \
                not isinstance(multi_modal_data, list):
            multi_modal_data = [multi_modal_data] * num_requests
        if not isinstance(lora_request, list):
            lora_request = [lora_request] * num_requests
        if len(lora_request) != num_requests:
            raise ValueError(
                "lora_request list must match the number of prompts.")

        for i in range(num_requests):
            self.llm_engine.add_request(
                request_id=str(next(self.request_counter)),
                prompt=prompts[i] if prompts is not None else None,
                sampling_params=sampling_params[i],
                prompt_token_ids=(prompt_token_ids[i]
                                  if prompt_token_ids is not None else None),
                lora_request=lora_request[i],
                multi_modal_data=(multi_modal_data[i]
                                  if multi_modal_data is not None else None))
        return self._run_engine(use_tqdm)

    def encode(
        self,
        prompts=None,
        pooling_params=None,
        prompt_token_ids=None,
        use_tqdm: bool = True,
        lora_request=None,
    ):
        """Batched embedding inference (reference LLM.encode,
        entrypoints/llm.py)."""
        from neural_magic_vllm_tpu.pooling_params import PoolingParams
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids required.")
        if isinstance(prompts, str):
            prompts = [prompts]
        num_requests = len(prompts) if prompts is not None else len(
            prompt_token_ids)
        if pooling_params is None:
            pooling_params = PoolingParams()
        for i in range(num_requests):
            self.llm_engine.add_request(
                request_id=str(next(self.request_counter)),
                prompt=prompts[i] if prompts is not None else None,
                prompt_token_ids=(prompt_token_ids[i]
                                  if prompt_token_ids is not None else None),
                pooling_params=pooling_params,
                lora_request=lora_request)
        return self._run_engine(use_tqdm)

    def _run_engine(self, use_tqdm: bool) -> List[RequestOutput]:
        pbar = tqdm(total=self.llm_engine.get_num_unfinished_requests(),
                    desc="Processed prompts",
                    dynamic_ncols=True) if use_tqdm else None
        outputs: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    outputs.append(output)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        return sorted(outputs, key=lambda x: int(x.request_id))
