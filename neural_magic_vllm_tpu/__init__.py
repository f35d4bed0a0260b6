"""neural_magic_vllm_tpu: TPU-native LLM serving engine (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of neuralmagic/nm-vllm
(vLLM ~0.5.x fork): paged-KV continuous batching, prefix caching, chunked
prefill, quantized serving, OpenAI-compatible API — designed TPU-first.
"""
from neural_magic_vllm_tpu.engine.arg_utils import (AsyncEngineArgs,
                                                    EngineArgs)
from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
from neural_magic_vllm_tpu.entrypoints.llm import LLM
from neural_magic_vllm_tpu.outputs import (CompletionOutput, RequestOutput)
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.version import __version__

__all__ = [
    "LLM",
    "LLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
    "__version__",
]
