"""Engine output types (analogue of reference vllm/outputs.py)."""
import time
from dataclasses import dataclass
from typing import List, Optional, Union

from neural_magic_vllm_tpu.sequence import (PromptLogprobs, RequestMetrics,
                                            SampleLogprobs, SequenceGroup,
                                            SequenceStatus)


@dataclass
class CompletionOutput:
    """One completed generation (reference vllm/outputs.py:10)."""
    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: float
    logprobs: Optional[SampleLogprobs]
    finish_reason: Optional[str] = None
    stop_reason: Union[int, str, None] = None

    def finished(self) -> bool:
        return self.finish_reason is not None


class RequestOutput:
    """Full output of one request (reference vllm/outputs.py:63)."""

    def __init__(
        self,
        request_id: str,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        prompt_logprobs: Optional[PromptLogprobs],
        outputs: List[CompletionOutput],
        finished: bool,
        metrics: Optional[RequestMetrics] = None,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.prompt_logprobs = prompt_logprobs
        self.outputs = outputs
        self.finished = finished
        self.metrics = metrics

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        seqs = seq_group.get_seqs()
        sp = seq_group.sampling_params
        if sp.n == 1 and not sp.use_beam_search:
            top_n_seqs = seqs
        else:
            n = sp.n
            if sp.use_beam_search:
                key = lambda seq: seq.get_beam_search_score(sp.length_penalty)
            else:
                key = lambda seq: seq.get_cumulative_logprob()
            top_n_seqs = sorted(seqs, key=key, reverse=True)[:n]

        include_logprobs = sp.logprobs is not None
        text_buffer_length = 0  # streaming handled by output processor
        outputs = [
            CompletionOutput(
                index=seqs.index(seq),
                text=seq.output_text,
                token_ids=list(seq.get_output_token_ids()),
                cumulative_logprob=seq.get_cumulative_logprob(),
                logprobs=seq.output_logprobs if include_logprobs else None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
                stop_reason=seq.stop_reason,
            ) for seq in top_n_seqs
        ]
        finished = seq_group.is_finished()
        if finished:
            seq_group.set_finished_time(time.time())
        return cls(
            request_id=seq_group.request_id,
            prompt=seq_group.prompt,
            prompt_token_ids=seq_group.prompt_token_ids,
            prompt_logprobs=seq_group.prompt_logprobs,
            outputs=outputs,
            finished=finished,
            metrics=seq_group.metrics,
        )

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"finished={self.finished}, outputs={self.outputs})")


@dataclass
class EmbeddingOutput:
    """Pooled embedding output (reference vllm/outputs.py:44)."""
    embedding: List[float]


class EmbeddingRequestOutput:

    def __init__(self, request_id: str, outputs: EmbeddingOutput,
                 prompt_token_ids: List[int], finished: bool):
        self.request_id = request_id
        self.outputs = outputs
        self.prompt_token_ids = prompt_token_ids
        self.finished = finished
