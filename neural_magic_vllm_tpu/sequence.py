"""Request / sequence data model.

Mirrors the reference vllm/sequence.py (954 LoC): SequenceData holds token
ids + computed-token progress; Sequence adds block hashing for prefix
caching; SequenceGroup groups the n/best_of siblings of one request;
SequenceGroupMetadata is the scheduler->worker wire format;
ExecuteModelRequest is the engine->executor wire format.
"""
import enum
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Set, Tuple, Union

from neural_magic_vllm_tpu.sampling_params import SamplingParams


@dataclass
class Logprob:
    """Log probability of one token (reference vllm/sequence.py:40)."""
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# {token_id -> Logprob} per sampled position
SampleLogprobs = List[Dict[int, Logprob]]
PromptLogprobs = List[Optional[Dict[int, Logprob]]]


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status in (SequenceStatus.FINISHED_STOPPED,
                          SequenceStatus.FINISHED_LENGTH_CAPPED,
                          SequenceStatus.FINISHED_ABORTED,
                          SequenceStatus.FINISHED_IGNORED)

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return {
            SequenceStatus.FINISHED_STOPPED: "stop",
            SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
            SequenceStatus.FINISHED_ABORTED: "abort",
            SequenceStatus.FINISHED_IGNORED: "length",
        }.get(status)


class SequenceStage(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


@dataclass
class RequestMetrics:
    """Per-request latency metrics (reference vllm/sequence.py:77)."""
    arrival_time: float
    last_token_time: float
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None


class SequenceData:
    """Token ids + generation progress (reference vllm/sequence.py:100)."""

    def __init__(self, prompt_token_ids: List[int],
                 output_token_ids: Optional[List[int]] = None) -> None:
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids = list(output_token_ids or [])
        self.cumulative_logprob = 0.0
        # Tokens whose KV is already computed (prefix cache / chunked prefill).
        self._num_computed_tokens = 0
        self._stage = SequenceStage.PREFILL

    def append_token_id(self, token_id: int, logprob: float) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_num_computed_tokens(self) -> int:
        return self._num_computed_tokens

    def update_num_computed_tokens(self, num: int) -> None:
        self._num_computed_tokens += num
        assert self._num_computed_tokens <= self.get_len(), (
            self._num_computed_tokens, self.get_len())
        if self.get_num_uncomputed_tokens() == 0:
            self._stage = SequenceStage.DECODE

    def reset_state_for_recompute(self) -> None:
        """On RECOMPUTE preemption all KV is discarded."""
        self._num_computed_tokens = 0
        self._stage = SequenceStage.PREFILL

    def get_num_uncomputed_tokens(self) -> int:
        return self.get_len() - self._num_computed_tokens

    def get_last_token_id(self) -> int:
        if not self.output_token_ids:
            return self.prompt_token_ids[-1]
        return self.output_token_ids[-1]

    @property
    def stage(self) -> SequenceStage:
        return self._stage

    def __repr__(self) -> str:
        return (f"SequenceData(prompt_len={self.get_prompt_len()}, "
                f"output_len={self.get_output_len()}, "
                f"computed={self._num_computed_tokens}, stage={self._stage})")


class Sequence:
    """One generation stream (reference vllm/sequence.py:232)."""

    def __init__(
        self,
        seq_id: int,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        block_size: int,
        eos_token_id: Optional[int] = None,
        lora_request: Optional[Any] = None,
        mm_hash: int = 0,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.eos_token_id = eos_token_id
        self.lora_request = lora_request
        # Content hash of any multimodal inputs: image placeholder tokens
        # are identical across requests, so prefix-cache block hashes must
        # mix in the image bytes or different images would share KV blocks.
        self.mm_hash = mm_hash
        self.data = SequenceData(prompt_token_ids)
        self.output_logprobs: SampleLogprobs = []
        self.output_text = ""
        self.status = SequenceStatus.WAITING
        self.stop_reason: Union[int, str, None] = None
        # Incremental detokenization state (reference detokenizer.py).
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None

    # --- prefix-cache block hashing (reference Sequence.hash_of_block) ----
    def hash_of_block(self, logical_idx: int) -> int:
        num_tokens = self.num_hashed_tokens_of_block(logical_idx)
        hashed = tuple(self.data.get_token_ids()[0:num_tokens])
        return hash((hashed, self.lora_int_id, self.mm_hash))

    def num_hashed_tokens_of_block(self, logical_idx: int) -> int:
        return logical_idx * self.block_size + self.block_size

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    # --- convenience -------------------------------------------------------
    def get_len(self) -> int:
        return self.data.get_len()

    def get_prompt_len(self) -> int:
        return self.data.get_prompt_len()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def get_output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    def get_num_new_tokens(self) -> int:
        """Tokens to compute next step: 1 in decode, else the remaining
        uncomputed prompt (chunked prefill may cap this)."""
        if self.data.stage == SequenceStage.DECODE:
            return 1
        return self.data.get_num_uncomputed_tokens()

    def is_prefill(self) -> bool:
        return self.data.stage == SequenceStage.PREFILL

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def append_token_id(self, token_id: int,
                        logprobs: Dict[int, Logprob]) -> None:
        assert token_id in logprobs
        self.output_logprobs.append(logprobs)
        self.data.append_token_id(token_id, logprobs[token_id].logprob)

    def get_beam_search_score(self,
                              length_penalty: float = 1.0,
                              seq_len: Optional[int] = None,
                              eos_token_id: Optional[int] = None) -> float:
        if seq_len is None:
            seq_len = self.get_len()
            if (eos_token_id is not None
                    and self.get_last_token_id() == eos_token_id):
                seq_len -= 1
        return self.get_cumulative_logprob() / (seq_len**length_penalty)

    def fork(self, new_seq_id: int) -> "Sequence":
        import copy
        new_seq = copy.deepcopy(self)
        new_seq.seq_id = new_seq_id
        return new_seq

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
                f"num_blocks={(self.get_len() + self.block_size - 1) // self.block_size})")


class SequenceGroup:
    """All sequences of one request (reference vllm/sequence.py:401)."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: Optional[SamplingParams],
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        trace_headers: Optional[Dict[str, str]] = None,
        pooling_params: Optional[Any] = None,
        multi_modal_data: Optional[Dict[str, Any]] = None,
        eos_token_id: Optional[int] = None,
    ) -> None:
        self.request_id = request_id
        # carried so the worker's host sampler can mask EOS under
        # min_tokens (reference min-tokens logit masking, sampler.py)
        self.eos_token_id = eos_token_id
        self.seqs_dict = {seq.seq_id: seq for seq in seqs}
        self.sampling_params = sampling_params
        self.pooling_params = pooling_params
        self.multi_modal_data = multi_modal_data
        self.embeddings = None  # set for embedding requests
        self.arrival_time = arrival_time if arrival_time is not None \
            else time.time()
        self.lora_request = lora_request
        self.trace_headers = trace_headers
        self.metrics = RequestMetrics(arrival_time=self.arrival_time,
                                      last_token_time=self.arrival_time)
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        self.state_generator_seed = sampling_params.seed \
            if sampling_params else None

    @property
    def prompt(self) -> Optional[str]:
        return next(iter(self.seqs_dict.values())).prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return next(iter(self.seqs_dict.values())).data.prompt_token_ids

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_max_num_running_seqs(self) -> int:
        """Max parallel sequences this group can ever need
        (reference vllm/sequence.py:472)."""
        if self.sampling_params is None:  # embedding request
            return 1
        if self.sampling_params.use_beam_search:
            return self.sampling_params.best_of
        if self.sampling_params.best_of > self.num_seqs():
            return self.sampling_params.best_of
        return self.num_unfinished_seqs()

    def get_seqs(self,
                 status: Optional[SequenceStatus] = None) -> List[Sequence]:
        if status is None:
            return list(self.seqs_dict.values())
        return [s for s in self.seqs_dict.values() if s.status == status]

    def get_unfinished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values() if not s.is_finished()]

    def get_finished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values() if s.is_finished()]

    def update_num_computed_tokens(self, num: int) -> None:
        for seq in self.seqs_dict.values():
            if not seq.is_finished():
                seq.data.update_num_computed_tokens(num)

    def get_num_uncomputed_tokens(self) -> int:
        return sum(s.data.get_num_uncomputed_tokens()
                   for s in self.get_unfinished_seqs())

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int:
        return len(self.get_unfinished_seqs())

    def find(self, seq_id: int) -> Sequence:
        return self.seqs_dict[seq_id]

    def add(self, seq: Sequence) -> None:
        assert seq.seq_id not in self.seqs_dict
        self.seqs_dict[seq.seq_id] = seq

    def remove(self, seq_id: int) -> None:
        del self.seqs_dict[seq_id]

    def is_finished(self) -> bool:
        return all(seq.is_finished() for seq in self.seqs_dict.values())

    def is_prefill(self) -> bool:
        # All sequences of a group are in the same stage.
        return next(iter(self.seqs_dict.values())).is_prefill()

    def maybe_set_first_token_time(self, now: float) -> None:
        if (self.metrics.first_token_time is None
                and next(iter(self.seqs_dict.values())).get_output_len() == 1):
            self.metrics.first_token_time = now

    def maybe_set_first_scheduled_time(self, now: float) -> None:
        if self.metrics.first_scheduled_time is None:
            self.metrics.first_scheduled_time = now
            self.metrics.time_in_queue = now - self.metrics.arrival_time

    def set_finished_time(self, now: float) -> None:
        self.metrics.finished_time = now

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"num_seqs={self.num_seqs()})")


class SequenceGroupMetadata:
    """Scheduler -> worker wire format (reference vllm/sequence.py:598)."""

    def __init__(
        self,
        request_id: str,
        is_prompt: bool,
        seq_data: Dict[int, SequenceData],
        sampling_params: SamplingParams,
        block_tables: Dict[int, List[int]],
        do_sample: bool = True,
        token_chunk_size: Optional[int] = None,
        computed_block_nums: Optional[List[int]] = None,
        lora_request: Optional[Any] = None,
        pooling_params: Optional[Any] = None,
        multi_modal_data: Optional[Dict[str, Any]] = None,
        eos_token_id: Optional[int] = None,
    ) -> None:
        self.request_id = request_id
        # carried so the worker's host sampler can mask EOS under
        # min_tokens (reference min-tokens logit masking, sampler.py)
        self.eos_token_id = eos_token_id
        self.is_prompt = is_prompt
        self.seq_data = seq_data
        self.sampling_params = sampling_params
        self.block_tables = block_tables
        self.do_sample = do_sample
        self.computed_block_nums = computed_block_nums
        self.lora_request = lora_request
        self.pooling_params = pooling_params
        self.multi_modal_data = multi_modal_data
        if token_chunk_size is None:
            if is_prompt:
                token_chunk_size = next(iter(
                    seq_data.values())).get_num_uncomputed_tokens()
            else:
                token_chunk_size = 1
        self._token_chunk_size = token_chunk_size

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    @property
    def token_chunk_size(self) -> int:
        return self._token_chunk_size


@dataclass
class SequenceOutput:
    """One sampled token of one sequence (reference vllm/sequence.py:727)."""
    parent_seq_id: int
    output_token: int
    logprobs: Dict[int, Logprob]


@dataclass
class CompletionSequenceGroupOutput:
    """Model output for one sequence group at one step
    (reference vllm/sequence.py:760)."""
    samples: List[SequenceOutput]
    prompt_logprobs: Optional[PromptLogprobs] = None


@dataclass
class EmbeddingSequenceGroupOutput:
    """Pooled embedding for one (finished) embedding request
    (reference vllm/sequence.py EmbeddingSequenceGroupOutput)."""
    embeddings: List[float]
    samples: List = None  # keeps the engine loop's interface uniform


@dataclass
class SamplerOutput:
    """Output of one model step: one CompletionSequenceGroupOutput per
    scheduled group (reference vllm/sequence.py:802)."""
    outputs: List[CompletionSequenceGroupOutput]
    spec_decode_worker_metrics: Optional[Any] = None
    model_forward_time: Optional[float] = None

    def __getitem__(self, idx: int):
        return self.outputs[idx]

    def __len__(self):
        return len(self.outputs)


@dataclass
class ExecuteModelRequest:
    """Engine -> executor wire format (reference vllm/sequence.py:916)."""
    seq_group_metadata_list: List[SequenceGroupMetadata]
    blocks_to_swap_in: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_swap_out: List[Tuple[int, int]] = field(default_factory=list)
    blocks_to_copy: List[Tuple[int, int]] = field(default_factory=list)
    num_lookahead_slots: int = 0
    running_queue_size: int = 0
    # WAITING-queue depth at schedule time: the worker shortens fused
    # decode windows at low load so arrivals don't sit behind a full
    # K-step dispatch (TTFT tail; PERF.md r4/r5 serving campaigns)
    num_waiting: int = 0
    virtual_engine: int = 0
    # requests/seqs that finished or aborted since the last step: the
    # worker purges its per-request host caches (mm embeddings, draft
    # bookkeeping, spec hidden states) on receipt (reference
    # finished_requests_ids, vllm/sequence.py:916)
    finished_request_ids: List[str] = field(default_factory=list)
    finished_seq_ids: List[int] = field(default_factory=list)

    def clone(self, seq_group_metadata_list) -> "ExecuteModelRequest":
        return ExecuteModelRequest(
            seq_group_metadata_list=seq_group_metadata_list,
            blocks_to_swap_in=list(self.blocks_to_swap_in),
            blocks_to_swap_out=list(self.blocks_to_swap_out),
            blocks_to_copy=list(self.blocks_to_copy),
            num_lookahead_slots=self.num_lookahead_slots,
            running_queue_size=self.running_queue_size,
            num_waiting=self.num_waiting,
            virtual_engine=self.virtual_engine)
