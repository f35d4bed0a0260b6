"""/v1/embeddings handler (reference
vllm/entrypoints/openai/serving_embedding.py)."""
import base64
import time
from typing import List, Union

import numpy as np
from pydantic import BaseModel, Field

from neural_magic_vllm_tpu.entrypoints.openai.protocol import (
    EmbeddingRequest, UsageInfo, random_uuid)
from neural_magic_vllm_tpu.entrypoints.openai.serving_engine import \
    OpenAIServing
from neural_magic_vllm_tpu.pooling_params import PoolingParams


class EmbeddingResponseData(BaseModel):
    index: int
    object: str = "embedding"
    embedding: Union[List[float], str]


class EmbeddingResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"embd-{random_uuid()}")
    object: str = "list"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str
    data: List[EmbeddingResponseData]
    usage: UsageInfo


class OpenAIServingEmbedding(OpenAIServing):

    async def create_embedding(self, request: EmbeddingRequest):
        error = self._check_model(request.model)
        if error is not None:
            return error
        inputs = request.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        request_id = f"embd-{random_uuid()}"
        data: List[EmbeddingResponseData] = []
        num_tokens = 0
        for i, item in enumerate(inputs):
            if isinstance(item, str):
                kwargs = {"prompt": item, "prompt_token_ids": None}
            else:
                kwargs = {"prompt": None, "prompt_token_ids": item}
            final = None
            async for out in self.engine.encode(
                    pooling_params=PoolingParams(),
                    request_id=f"{request_id}-{i}", **kwargs):
                final = out
            assert final is not None
            num_tokens += len(final.prompt_token_ids)
            emb = final.outputs.embedding
            if request.encoding_format == "base64":
                emb = base64.b64encode(
                    np.asarray(emb, np.float32).tobytes()).decode()
            data.append(EmbeddingResponseData(index=i, embedding=emb))
        return EmbeddingResponse(
            id=request_id, model=request.model, data=data,
            usage=UsageInfo(prompt_tokens=num_tokens,
                            total_tokens=num_tokens,
                            completion_tokens=None))
