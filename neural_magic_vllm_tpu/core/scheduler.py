"""Continuous-batching scheduler.

Semantics follow the reference vllm/core/scheduler.py (1226 LoC):
waiting/running/swapped queues, a per-step admission ledger (StepBudget)
capping tokens+seqs, prefill-first default policy, decode-first
chunked-prefill policy,
preemption by RECOMPUTE (single seq) or SWAP, swapped re-admission, prompt
limit rejection, and the artificial-preemption test hook.

TPU twist: the scheduler is the *bucket picker*. Because every step runs a
pre-compiled XLA executable with static shapes, the decode batch and each
prefill chunk must land on a bucket from SchedulerConfig's lattice; the
budget enforces the cap, the model runner pads up to the bucket.
"""
import enum
import os
import random
import time
from collections import deque
from dataclasses import dataclass
from typing import Deque, Dict, Iterable, List, Optional, Tuple, Union

from neural_magic_vllm_tpu import envs
from neural_magic_vllm_tpu.config import CacheConfig, LoRAConfig, \
    SchedulerConfig
from neural_magic_vllm_tpu.core.block_manager import PagedBlockSpaceManager
from neural_magic_vllm_tpu.core.interfaces import AllocStatus, \
    BlockSpaceManager
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.sequence import (Sequence, SequenceData,
                                            SequenceGroup,
                                            SequenceGroupMetadata,
                                            SequenceStatus)

logger = init_logger(__name__)

# Test hook (reference scheduler.py:21-24): with probability 0.5 pretend
# there is no space, forcing preemption paths to be exercised.
ENABLE_ARTIFICIAL_PREEMPT = bool(
    os.getenv("NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT", False))
ARTIFICIAL_PREEMPTION_PROB = 0.5
ARTIFICIAL_PREEMPTION_MAX_CNT = 500


class PreemptionMode(enum.Enum):
    """SWAP: move blocks to host memory. RECOMPUTE: drop KV, re-prefill
    later (cheaper for short sequences; reference PreemptionMode:27)."""
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


def order_by_arrival(queue: Deque[SequenceGroup]) -> Deque[SequenceGroup]:
    """FCFS ordering: earliest-arrived group first.

    This is the only scheduling policy (reference role: vllm/core/policy.py).
    `sorted` is stable, so same-timestamp groups keep queue order.
    """
    return deque(sorted(queue, key=lambda g: g.metrics.arrival_time))


class StepBudget:
    """Admission ledger for one schedule() step.

    Fills the role of the reference's per-step budget (vllm/core/
    scheduler.py:41) but keeps an explicit per-request claim ledger instead
    of set + counter pairs: each request id maps to the (tokens, seqs) it
    claimed, so a group that gets preempted or bounced hands back exactly
    its own claim, and re-claiming is an idempotent no-op.

    TPU angle: ``token_limit`` is also the ceiling of the compile-time
    bucket lattice — whatever fits this ledger must fit a padded executable.
    """

    def __init__(self, token_limit: int, seq_limit: int) -> None:
        self.token_limit = token_limit
        self.seq_limit = seq_limit
        self._token_claims: Dict[str, int] = {}
        self._seq_claims: Dict[str, int] = {}
        # running totals: fits()/remaining_tokens() sit on the scheduling
        # hot path (called once per queued group), so they must be O(1)
        self._used_tokens = 0
        self._used_seqs = 0

    def fits(self, *, num_new_tokens: int, num_new_seqs: int) -> bool:
        assert num_new_tokens > 0 and num_new_seqs > 0
        return (self._used_tokens + num_new_tokens <= self.token_limit
                and self._used_seqs + num_new_seqs <= self.seq_limit)

    def remaining_tokens(self) -> int:
        return self.token_limit - self._used_tokens

    def claim_tokens(self, req_id: str, num: int) -> None:
        if req_id not in self._token_claims:
            self._token_claims[req_id] = num
            self._used_tokens += num

    def release_tokens(self, req_id: str) -> None:
        claimed = self._token_claims.pop(req_id, None)
        if claimed is not None:
            self._used_tokens -= claimed

    def claim_seqs(self, req_id: str, num: int) -> None:
        if req_id not in self._seq_claims:
            self._seq_claims[req_id] = num
            self._used_seqs += num

    def release_seqs(self, req_id: str) -> None:
        claimed = self._seq_claims.pop(req_id, None)
        if claimed is not None:
            self._used_seqs -= claimed

    @property
    def used_tokens(self) -> int:
        return self._used_tokens

    @property
    def used_seqs(self) -> int:
        return self._used_seqs


class LaneBudget:
    """Scan-iteration lanes of the mixed fused window (windowed chunked
    prefill): K iterations x C tokens each; a prefill chunk of t tokens
    occupies ceil(t / C) whole iterations (chunks never share an
    iteration — the context-prefill kernel handles one sequence per
    call)."""

    def __init__(self, k: int, c: int) -> None:
        self.k = k
        self.c = c
        self.used = 0

    def lanes_for(self, tokens: int) -> int:
        return -(-tokens // self.c)

    def remaining(self) -> int:
        return self.k - self.used

    def trim(self, tokens: int) -> int:
        """Largest chunk <= tokens fitting the remaining lanes."""
        return min(tokens, max(0, self.remaining()) * self.c)

    def claim(self, tokens: int) -> None:
        self.used += self.lanes_for(tokens)


class LoraLedger:
    """Refcount of distinct LoRA adapters held by in-batch groups.

    Serving may only keep ``max_loras`` distinct adapters resident in the
    batched apply (lora/manager slot stack); the scheduler must therefore
    not admit a group whose adapter would exceed that (reference role:
    the ``curr_loras`` set threaded through vllm/core/scheduler.py:389-589).
    A refcount (not a set) so that preempting one of two groups sharing an
    adapter does not free the slot early.
    """

    def __init__(self, max_loras: int) -> None:
        self.max_loras = max_loras
        self._refs: Dict[int, int] = {}

    @classmethod
    def unlimited(cls) -> "LoraLedger":
        return cls(max_loras=0)

    def admits(self, lora_int_id: int) -> bool:
        if self.max_loras <= 0 or lora_int_id <= 0:
            return True
        return (lora_int_id in self._refs
                or len(self._refs) < self.max_loras)

    def acquire(self, lora_int_id: int) -> None:
        if lora_int_id > 0:
            self._refs[lora_int_id] = self._refs.get(lora_int_id, 0) + 1

    def release(self, lora_int_id: int) -> None:
        if lora_int_id > 0 and lora_int_id in self._refs:
            self._refs[lora_int_id] -= 1
            if self._refs[lora_int_id] <= 0:
                del self._refs[lora_int_id]


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    # Tokens scheduled this step; 1 for decode, up to the whole remaining
    # prompt for (chunked) prefill.
    token_chunk_size: int


@dataclass
class SchedulerOutputs:
    """Result of one schedule() call (reference scheduler.py:112)."""
    scheduled_seq_groups: List[ScheduledSequenceGroup]
    num_prefill_groups: int
    num_batched_tokens: int
    blocks_to_swap_in: List[Tuple[int, int]]
    blocks_to_swap_out: List[Tuple[int, int]]
    blocks_to_copy: List[Tuple[int, int]]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int
    running_queue_size: int
    preempted: int

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)


@dataclass
class SchedulerRunningOutputs:
    decode_seq_groups: List[ScheduledSequenceGroup]
    prefill_seq_groups: List[ScheduledSequenceGroup]
    preempted: List[SequenceGroup]
    swapped_out: List[SequenceGroup]
    blocks_to_swap_out: List[Tuple[int, int]]
    blocks_to_copy: List[Tuple[int, int]]
    num_lookahead_slots: int

    @classmethod
    def create_empty(cls) -> "SchedulerRunningOutputs":
        return cls([], [], [], [], [], [], 0)


@dataclass
class SchedulerSwappedInOutputs:
    decode_seq_groups: List[ScheduledSequenceGroup]
    prefill_seq_groups: List[ScheduledSequenceGroup]
    blocks_to_swap_in: List[Tuple[int, int]]
    blocks_to_copy: List[Tuple[int, int]]
    num_lookahead_slots: int
    infeasible_seq_groups: List[SequenceGroup]

    @classmethod
    def create_empty(cls) -> "SchedulerSwappedInOutputs":
        return cls([], [], [], [], 0, [])


@dataclass
class SchedulerPrefillOutputs:
    seq_groups: List[ScheduledSequenceGroup]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int

    @classmethod
    def create_empty(cls) -> "SchedulerPrefillOutputs":
        return cls([], [], 0)


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        self.block_manager: BlockSpaceManager = PagedBlockSpaceManager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks or 0,
            num_cpu_blocks=cache_config.num_cpu_blocks or 0,
            sliding_window=cache_config.sliding_window,
            enable_caching=cache_config.enable_prefix_caching,
        )

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()

        # finished/aborted ids accumulated for the worker's next step so
        # it can purge per-request host caches (reference
        # finished_requests_ids on ExecuteModelRequest)
        self._finished_req_ids: List[str] = []
        self._finished_seq_ids: List[int] = []

        self.prev_time = 0.0
        self.prev_prompt = False
        self.last_prompt_latency = 0.0
        self.user_specified_preemption_mode = scheduler_config.preemption_mode
        self.num_cumulative_preemption = 0

        self.enable_artificial_preemption = (
            ENABLE_ARTIFICIAL_PREEMPT
            or envs.NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT)
        self.artificial_preempt_cnt = (ARTIFICIAL_PREEMPTION_MAX_CNT
                                       if self.enable_artificial_preemption
                                       else 0)

    @property
    def lora_enabled(self) -> bool:
        return bool(self.lora_config)

    @property
    def num_decoding_tokens_per_seq(self) -> int:
        return 1

    # --- queue management ----------------------------------------------------
    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        if isinstance(request_id, str):
            request_id = (request_id, )
        request_ids = set(request_id)
        for state_queue in (self.waiting, self.running, self.swapped):
            aborted: List[SequenceGroup] = []
            for seq_group in state_queue:
                if not request_ids:
                    break
                if seq_group.request_id in request_ids:
                    aborted.append(seq_group)
                    request_ids.remove(seq_group.request_id)
            for seq_group in aborted:
                state_queue.remove(seq_group)
                self._finished_req_ids.append(seq_group.request_id)
                for seq in seq_group.get_seqs():
                    self._finished_seq_ids.append(seq.seq_id)
                    if seq.is_finished():
                        continue
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_finished_seq_groups(self) -> None:
        for sg in self.running:
            if sg.is_finished():
                self._finished_req_ids.append(sg.request_id)
                self._finished_seq_ids.extend(
                    s.seq_id for s in sg.get_seqs())
        self.running = deque(sg for sg in self.running
                             if not sg.is_finished())

    def get_and_reset_finished_ids(self):
        """Drain (request ids, seq ids) finished since the last call."""
        req_ids, seq_ids = self._finished_req_ids, self._finished_seq_ids
        self._finished_req_ids, self._finished_seq_ids = [], []
        return req_ids, seq_ids

    # --- helpers --------------------------------------------------------------
    def _passed_delay(self, now: float) -> bool:
        """Prompt-scheduling delay heuristic (reference scheduler.py:1149)."""
        if self.prev_prompt:
            self.last_prompt_latency = now - self.prev_time
        self.prev_time, self.prev_prompt = now, False
        if self.scheduler_config.delay_factor > 0 and self.waiting:
            earliest = min(sg.metrics.arrival_time for sg in self.waiting)
            return ((now - earliest) >
                    (self.scheduler_config.delay_factor *
                     self.last_prompt_latency) or not self.running)
        return True

    def _get_num_lookahead_slots(self, is_prefill: bool) -> int:
        if is_prefill:
            return 0
        return self.scheduler_config.num_lookahead_slots

    def _get_num_new_tokens(self, seq_group: SequenceGroup,
                            status: SequenceStatus, enable_chunking: bool,
                            budget: StepBudget) -> int:
        num_new_tokens = 0
        seqs = seq_group.get_seqs(status=status)
        for seq in seqs:
            num_new_tokens += seq.get_num_new_tokens()
        if num_new_tokens == 0:
            return 0
        if enable_chunking and len(seqs) == 1:
            num_new_tokens = min(num_new_tokens,
                                 budget.remaining_tokens())
            sc = self.scheduler_config
            if sc.num_scheduler_steps > 1 and num_new_tokens > 1:
                from neural_magic_vllm_tpu import envs
                if envs.NMV_TPU_MIXED_PREFILL_WINDOW:
                    # windowed mixed mode: a chunk must fit the fused
                    # window's K x mixed_chunk_width prefill lanes
                    num_new_tokens = min(
                        num_new_tokens,
                        sc.num_scheduler_steps * sc.mixed_chunk_width())
        return num_new_tokens

    def _can_append_slots(self, seq_group: SequenceGroup) -> bool:
        if self.enable_artificial_preemption \
                and random.uniform(0, 1) < ARTIFICIAL_PREEMPTION_PROB \
                and self.artificial_preempt_cnt > 0:
            self.artificial_preempt_cnt -= 1
            return False
        return self.block_manager.can_append_slots(
            seq_group=seq_group,
            num_lookahead_slots=self._get_num_lookahead_slots(False))

    # --- allocation transitions -----------------------------------------------
    def _allocate_and_set_running(self, seq_group: SequenceGroup) -> None:
        self.block_manager.allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING

    def _append_slots(self, seq_group: SequenceGroup,
                      blocks_to_copy: List[Tuple[int, int]]) -> None:
        num_lookahead_slots = self._get_num_lookahead_slots(is_prefill=False)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            cows = self.block_manager.append_slots(seq, num_lookahead_slots)
            blocks_to_copy.extend(cows)

    def _preempt(self, seq_group: SequenceGroup,
                 blocks_to_swap_out: List[Tuple[int, int]],
                 preemption_mode: Optional[PreemptionMode] = None
                 ) -> PreemptionMode:
        if self.user_specified_preemption_mode is None:
            if seq_group.get_max_num_running_seqs() == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        elif self.user_specified_preemption_mode == "swap":
            preemption_mode = PreemptionMode.SWAP
        else:
            preemption_mode = PreemptionMode.RECOMPUTE

        if preemption_mode == PreemptionMode.RECOMPUTE and \
                seq_group.get_max_num_running_seqs() > 1:
            # Recompute cannot replay a forked group (children share CoW
            # prompt blocks and have divergent outputs); even under a
            # user-forced recompute mode these must swap.
            preemption_mode = PreemptionMode.SWAP

        if self.num_cumulative_preemption % 50 == 0:
            logger.warning(
                "Sequence group %s is preempted by %s mode because there is "
                "not enough KV cache space. This can affect the end-to-end "
                "performance. Increase hbm_utilization or decrease "
                "max_num_seqs. total_num_cumulative_preemption=%d",
                seq_group.request_id, preemption_mode,
                self.num_cumulative_preemption + 1)
        self.num_cumulative_preemption += 1

        if preemption_mode == PreemptionMode.RECOMPUTE:
            self._preempt_by_recompute(seq_group)
        elif preemption_mode == PreemptionMode.SWAP:
            self._preempt_by_swap(seq_group, blocks_to_swap_out)
        else:
            raise AssertionError("Invalid preemption mode.")
        return preemption_mode

    def _preempt_by_recompute(self, seq_group: SequenceGroup) -> None:
        seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        assert len(seqs) == 1
        for seq in seqs:
            seq.status = SequenceStatus.WAITING
            self.free_seq(seq)
            seq.data.reset_state_for_recompute()

    def _preempt_by_swap(self, seq_group: SequenceGroup,
                         blocks_to_swap_out: List[Tuple[int, int]]) -> None:
        self._swap_out(seq_group, blocks_to_swap_out)

    def _swap_in(self, seq_group: SequenceGroup,
                 blocks_to_swap_in: List[Tuple[int, int]]) -> None:
        mapping = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.extend(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def _swap_out(self, seq_group: SequenceGroup,
                  blocks_to_swap_out: List[Tuple[int, int]]) -> None:
        if not self.block_manager.can_swap_out(seq_group):
            raise RuntimeError(
                "Aborted due to the lack of CPU swap space. Please increase "
                "the swap space to avoid this error.")
        mapping = self.block_manager.swap_out(seq_group)
        blocks_to_swap_out.extend(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED

    # --- sub-schedulers ---------------------------------------------------------
    def _lora_ledger(self) -> LoraLedger:
        """Ledger seeded with the adapters the RUNNING queue already holds."""
        if not self.lora_config:
            return LoraLedger.unlimited()
        ledger = LoraLedger(self.lora_config.max_loras)
        for seq_group in self.running:
            ledger.acquire(seq_group.lora_int_id)
        return ledger

    def _schedule_running(
        self,
        running_queue: Deque[SequenceGroup],
        budget: StepBudget,
        loras: LoraLedger,
        enable_chunking: bool = False,
        lane_budget: Optional["LaneBudget"] = None,
    ) -> Tuple[Deque[SequenceGroup], SchedulerRunningOutputs]:
        """Schedule groups already RUNNING; preempt from the back of the
        priority order when slots run out (reference _schedule_running:388).
        ``lane_budget`` (windowed mixed mode) bounds the chunked-prefill
        groups scheduled this step by the fused window's K x C iteration
        lanes — each group occupies ceil(chunk / C) scan iterations in
        the mixed dispatch; overflow groups stay RUNNING and resume next
        step, FCFS."""
        blocks_to_swap_out: List[Tuple[int, int]] = []
        blocks_to_copy: List[Tuple[int, int]] = []
        decode_seq_groups: List[ScheduledSequenceGroup] = []
        prefill_seq_groups: List[ScheduledSequenceGroup] = []
        preempted: List[SequenceGroup] = []
        swapped_out: List[SequenceGroup] = []
        skipped_prefills: List[SequenceGroup] = []

        running_queue = order_by_arrival(running_queue)

        while running_queue:
            seq_group = running_queue[0]
            if (lane_budget is not None and seq_group.is_prefill()
                    and lane_budget.remaining() <= 0):
                skipped_prefills.append(running_queue.popleft())
                continue
            num_running_tokens = self._get_num_new_tokens(
                seq_group, SequenceStatus.RUNNING, enable_chunking, budget)
            if num_running_tokens == 0:
                break
            if lane_budget is not None and seq_group.is_prefill():
                need = lane_budget.lanes_for(num_running_tokens)
                if need > lane_budget.remaining():
                    # trim the chunk to the remaining lanes instead of
                    # skipping outright (keeps big prompts progressing)
                    num_running_tokens = lane_budget.trim(
                        num_running_tokens)
                    if num_running_tokens == 0:
                        skipped_prefills.append(running_queue.popleft())
                        continue
                lane_budget.claim(num_running_tokens)
            running_queue.popleft()
            while not self._can_append_slots(seq_group):
                budget.release_tokens(seq_group.request_id)
                budget.release_seqs(seq_group.request_id)
                if running_queue:
                    # Preempt the lowest-priority group.
                    victim = running_queue.pop()
                    loras.release(victim.lora_int_id)
                    mode = self._preempt(victim, blocks_to_swap_out)
                    if mode == PreemptionMode.RECOMPUTE:
                        preempted.append(victim)
                    else:
                        swapped_out.append(victim)
                else:
                    # Preempt the current group itself.
                    loras.release(seq_group.lora_int_id)
                    mode = self._preempt(seq_group, blocks_to_swap_out)
                    if mode == PreemptionMode.RECOMPUTE:
                        preempted.append(seq_group)
                    else:
                        swapped_out.append(seq_group)
                    break
            else:
                self._append_slots(seq_group, blocks_to_copy)
                is_prefill = seq_group.is_prefill()
                if is_prefill:
                    prefill_seq_groups.append(
                        ScheduledSequenceGroup(
                            seq_group=seq_group,
                            token_chunk_size=num_running_tokens))
                else:
                    decode_seq_groups.append(
                        ScheduledSequenceGroup(seq_group=seq_group,
                                               token_chunk_size=1))
                budget.claim_tokens(seq_group.request_id,
                                    num_running_tokens)
                if enable_chunking:
                    budget.claim_seqs(seq_group.request_id,
                                      seq_group.get_max_num_running_seqs())

        running_queue.extend(skipped_prefills)
        return running_queue, SchedulerRunningOutputs(
            decode_seq_groups=decode_seq_groups,
            prefill_seq_groups=prefill_seq_groups,
            preempted=preempted,
            swapped_out=swapped_out,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False))

    def _schedule_swapped(
        self,
        swapped_queue: Deque[SequenceGroup],
        budget: StepBudget,
        loras: LoraLedger,
        enable_chunking: bool = False,
    ) -> Tuple[Deque[SequenceGroup], SchedulerSwappedInOutputs]:
        """Re-admit swapped-out groups when space allows
        (reference _schedule_swapped:502)."""
        blocks_to_swap_in: List[Tuple[int, int]] = []
        blocks_to_copy: List[Tuple[int, int]] = []
        decode_seq_groups: List[ScheduledSequenceGroup] = []
        prefill_seq_groups: List[ScheduledSequenceGroup] = []
        infeasible_seq_groups: List[SequenceGroup] = []

        swapped_queue = order_by_arrival(swapped_queue)
        leftover_swapped: Deque[SequenceGroup] = deque()

        while swapped_queue:
            seq_group = swapped_queue[0]
            is_prefill = seq_group.is_prefill()
            alloc_status = self.block_manager.can_swap_in(
                seq_group, self._get_num_lookahead_slots(is_prefill))
            if alloc_status == AllocStatus.LATER:
                break
            if alloc_status == AllocStatus.NEVER:
                logger.warning(
                    "Failing the request %s because there's not enough KV "
                    "cache blocks to run the entire sequence.",
                    seq_group.request_id)
                for seq in seq_group.get_seqs():
                    seq.status = SequenceStatus.FINISHED_IGNORED
                infeasible_seq_groups.append(seq_group)
                swapped_queue.popleft()
                continue

            if not loras.admits(seq_group.lora_int_id):
                # Adapter slots exhausted: bounce just this group so
                # groups behind it (other adapters / no adapter) still
                # get considered.
                leftover_swapped.appendleft(seq_group)
                swapped_queue.popleft()
                continue

            num_new_seqs = seq_group.get_max_num_running_seqs()
            num_new_tokens = self._get_num_new_tokens(seq_group,
                                                      SequenceStatus.SWAPPED,
                                                      enable_chunking, budget)
            if (num_new_tokens == 0 or not budget.fits(
                    num_new_tokens=num_new_tokens,
                    num_new_seqs=num_new_seqs)):
                break

            swapped_queue.popleft()
            loras.acquire(seq_group.lora_int_id)
            self._swap_in(seq_group, blocks_to_swap_in)
            self._append_slots(seq_group, blocks_to_copy)
            if seq_group.is_prefill():
                prefill_seq_groups.append(
                    ScheduledSequenceGroup(seq_group,
                                           token_chunk_size=num_new_tokens))
            else:
                decode_seq_groups.append(
                    ScheduledSequenceGroup(seq_group, token_chunk_size=1))
            budget.claim_tokens(seq_group.request_id, num_new_tokens)
            budget.claim_seqs(seq_group.request_id, num_new_seqs)

        swapped_queue.extendleft(leftover_swapped)
        return swapped_queue, SchedulerSwappedInOutputs(
            decode_seq_groups=decode_seq_groups,
            prefill_seq_groups=prefill_seq_groups,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_copy=blocks_to_copy,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=False),
            infeasible_seq_groups=infeasible_seq_groups)

    def _get_prompt_limit(self, seq_group: SequenceGroup) -> int:
        if self.scheduler_config.chunked_prefill_enabled:
            return self.scheduler_config.max_model_len
        return min(self.scheduler_config.max_model_len,
                   self.scheduler_config.max_num_batched_tokens)

    def _schedule_prefills(
        self,
        waiting_queue: Deque[SequenceGroup],
        budget: StepBudget,
        loras: LoraLedger,
        enable_chunking: bool = False,
        lane_budget: Optional["LaneBudget"] = None,
    ) -> Tuple[Deque[SequenceGroup], SchedulerPrefillOutputs]:
        """Admit WAITING groups (reference _schedule_prefills:616).
        ``lane_budget``: see _schedule_running."""
        ignored_seq_groups: List[SequenceGroup] = []
        seq_groups: List[ScheduledSequenceGroup] = []
        waiting_queue = deque(waiting_queue)
        leftover_waiting_sequences: Deque[SequenceGroup] = deque()

        while self._passed_delay(time.time()) and waiting_queue:
            if lane_budget is not None and lane_budget.remaining() <= 0:
                break
            seq_group = waiting_queue[0]
            waiting_seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
            assert len(waiting_seqs) == 1, (
                "Waiting sequence group should have only one prompt "
                "sequence.")
            num_new_tokens = self._get_num_new_tokens(seq_group,
                                                      SequenceStatus.WAITING,
                                                      enable_chunking, budget)
            if not enable_chunking:
                num_prompt_tokens = waiting_seqs[0].get_len()
                assert num_new_tokens == num_prompt_tokens

            prompt_limit = self._get_prompt_limit(seq_group)
            if num_new_tokens > prompt_limit:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds limit "
                    "of %d", num_new_tokens, prompt_limit)
                for seq in waiting_seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored_seq_groups.append(seq_group)
                waiting_queue.popleft()
                continue

            can_allocate = self.block_manager.can_allocate(seq_group)
            if can_allocate == AllocStatus.LATER:
                break
            if can_allocate == AllocStatus.NEVER:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds the "
                    "capacity of the block manager", num_new_tokens)
                for seq in waiting_seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored_seq_groups.append(seq_group)
                waiting_queue.popleft()
                continue

            if not loras.admits(seq_group.lora_int_id):
                leftover_waiting_sequences.appendleft(seq_group)
                waiting_queue.popleft()
                continue

            if lane_budget is not None:
                trimmed = lane_budget.trim(num_new_tokens)
                if trimmed == 0:
                    break
                if trimmed < num_new_tokens and not enable_chunking:
                    break  # whole-prompt admission cannot be trimmed
                if enable_chunking:
                    num_new_tokens = trimmed

            num_new_seqs = seq_group.get_max_num_running_seqs()
            if (num_new_tokens == 0 or not budget.fits(
                    num_new_tokens=num_new_tokens,
                    num_new_seqs=num_new_seqs)):
                break

            waiting_queue.popleft()
            loras.acquire(seq_group.lora_int_id)
            if lane_budget is not None:
                lane_budget.claim(num_new_tokens)
            self._allocate_and_set_running(seq_group)
            seq_group.maybe_set_first_scheduled_time(time.time())
            seq_groups.append(
                ScheduledSequenceGroup(seq_group=seq_group,
                                       token_chunk_size=num_new_tokens))
            budget.claim_tokens(seq_group.request_id, num_new_tokens)
            budget.claim_seqs(seq_group.request_id, num_new_seqs)

        waiting_queue.extendleft(leftover_waiting_sequences)
        if seq_groups:
            self.prev_prompt = True
        return waiting_queue, SchedulerPrefillOutputs(
            seq_groups=seq_groups,
            ignored_seq_groups=ignored_seq_groups,
            num_lookahead_slots=self._get_num_lookahead_slots(
                is_prefill=True))

    # --- top-level policies --------------------------------------------------
    def _schedule_default(self) -> SchedulerOutputs:
        """Prefill-first batching: schedule all fitting prefills, else
        decodes (reference _schedule_default:752)."""
        budget = StepBudget(
            token_limit=self.scheduler_config.max_num_batched_tokens,
            seq_limit=self.scheduler_config.max_num_seqs,
        )
        for seq_group in self.running:
            budget.claim_seqs(seq_group.request_id,
                              seq_group.get_max_num_running_seqs())

        prefills = SchedulerPrefillOutputs.create_empty()
        running_scheduled = SchedulerRunningOutputs.create_empty()
        swapped_in = SchedulerSwappedInOutputs.create_empty()

        loras = self._lora_ledger()

        # Prefill new requests only when nothing is swapped out.
        if not self.swapped:
            self.waiting, prefills = self._schedule_prefills(
                self.waiting, budget, loras, enable_chunking=False)

        # No prefills scheduled -> run decodes (+ swapped re-admission).
        if len(prefills.seq_groups) == 0:
            self.running, running_scheduled = self._schedule_running(
                self.running, budget, loras, enable_chunking=False)
            if (len(running_scheduled.preempted) +
                    len(running_scheduled.swapped_out) == 0):
                self.swapped, swapped_in = self._schedule_swapped(
                    self.swapped, budget, loras)

        assert budget.used_tokens <= \
            self.scheduler_config.max_num_batched_tokens
        assert budget.used_seqs <= self.scheduler_config.max_num_seqs

        self.waiting.extendleft(running_scheduled.preempted)
        self.running.extend(
            [s.seq_group for s in prefills.seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.decode_seq_groups])
        self.swapped.extend(running_scheduled.swapped_out)
        preempted = (len(running_scheduled.preempted) +
                     len(running_scheduled.swapped_out))

        assert len(prefills.seq_groups) == 0 or \
            len(running_scheduled.decode_seq_groups) == 0

        return SchedulerOutputs(
            scheduled_seq_groups=(prefills.seq_groups +
                                  running_scheduled.decode_seq_groups +
                                  swapped_in.decode_seq_groups),
            num_prefill_groups=len(prefills.seq_groups),
            num_batched_tokens=budget.used_tokens,
            blocks_to_swap_in=swapped_in.blocks_to_swap_in,
            blocks_to_swap_out=running_scheduled.blocks_to_swap_out,
            blocks_to_copy=(running_scheduled.blocks_to_copy +
                            swapped_in.blocks_to_copy),
            ignored_seq_groups=(prefills.ignored_seq_groups +
                                swapped_in.infeasible_seq_groups),
            num_lookahead_slots=running_scheduled.num_lookahead_slots,
            running_queue_size=len(self.running),
            preempted=preempted,
        )

    def _schedule_chunked_prefill(self) -> SchedulerOutputs:
        """Decode-first policy with prompt chunking
        (reference _schedule_chunked_prefill:846)."""
        budget = StepBudget(
            token_limit=self.scheduler_config.max_num_batched_tokens,
            seq_limit=self.scheduler_config.max_num_seqs,
        )
        loras = self._lora_ledger()

        # Windowed mixed mode (multi-step decode + chunked prefill):
        # prefill chunks ride INSIDE the fused decode dispatch (worker
        # decode_multi_mixed) — each group occupies ceil(chunk / C) of
        # the window's K scan-iteration lanes, so prefill scheduling is
        # bounded by a lane budget instead of a token budget alone.
        # Overflow groups wait a window (FCFS); decodes never stall.
        from neural_magic_vllm_tpu import envs
        windowed = (self.scheduler_config.num_scheduler_steps > 1
                    and envs.NMV_TPU_MIXED_PREFILL_WINDOW)
        lanes = None
        if windowed:
            lanes = LaneBudget(self.scheduler_config.num_scheduler_steps,
                               self.scheduler_config.mixed_chunk_width())

        # Decodes (and in-flight chunked prefills) first.
        self.running, running_scheduled = self._schedule_running(
            self.running, budget, loras, enable_chunking=True,
            lane_budget=lanes)

        swapped_in = SchedulerSwappedInOutputs.create_empty()
        if (len(running_scheduled.preempted) +
                len(running_scheduled.swapped_out) == 0):
            self.swapped, swapped_in = self._schedule_swapped(
                self.swapped, budget, loras)

        # New prefills fill the remaining token budget / window lanes.
        self.waiting, prefills = self._schedule_prefills(
            self.waiting, budget, loras, enable_chunking=True,
            lane_budget=lanes)

        assert budget.used_tokens <= \
            self.scheduler_config.max_num_batched_tokens
        assert budget.used_seqs <= self.scheduler_config.max_num_seqs

        self.waiting.extendleft(running_scheduled.preempted)
        self.running.extend([s.seq_group for s in prefills.seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in running_scheduled.prefill_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.decode_seq_groups])
        self.running.extend(
            [s.seq_group for s in swapped_in.prefill_seq_groups])
        self.swapped.extend(running_scheduled.swapped_out)

        return SchedulerOutputs(
            scheduled_seq_groups=(prefills.seq_groups +
                                  running_scheduled.prefill_seq_groups +
                                  swapped_in.prefill_seq_groups +
                                  running_scheduled.decode_seq_groups +
                                  swapped_in.decode_seq_groups),
            num_prefill_groups=(len(prefills.seq_groups) +
                                len(running_scheduled.prefill_seq_groups) +
                                len(swapped_in.prefill_seq_groups)),
            num_batched_tokens=budget.used_tokens,
            blocks_to_swap_in=swapped_in.blocks_to_swap_in,
            blocks_to_swap_out=running_scheduled.blocks_to_swap_out,
            blocks_to_copy=(running_scheduled.blocks_to_copy +
                            swapped_in.blocks_to_copy),
            ignored_seq_groups=(prefills.ignored_seq_groups +
                                swapped_in.infeasible_seq_groups),
            num_lookahead_slots=running_scheduled.num_lookahead_slots,
            running_queue_size=len(self.running),
            preempted=(len(running_scheduled.preempted) +
                       len(running_scheduled.swapped_out)),
        )

    def _schedule(self) -> SchedulerOutputs:
        if self.scheduler_config.chunked_prefill_enabled:
            return self._schedule_chunked_prefill()
        return self._schedule_default()

    # --- public API -------------------------------------------------------------
    def schedule(
            self
    ) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        scheduler_outputs = self._schedule()
        now = time.time()

        seq_group_metadata_list: List[SequenceGroupMetadata] = []
        for i, scheduled_seq_group in enumerate(
                scheduler_outputs.scheduled_seq_groups):
            seq_group = scheduled_seq_group.seq_group
            token_chunk_size = scheduled_seq_group.token_chunk_size
            seq_group.maybe_set_first_scheduled_time(now)

            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_id = seq.seq_id
                seq_data[seq_id] = seq.data
                block_tables[seq_id] = self.block_manager.get_block_table(seq)
                self.block_manager.access_all_blocks_in_seq(seq, now)

            common_computed_block_nums = (
                self.block_manager.get_common_computed_block_ids(
                    seq_group.get_seqs(status=SequenceStatus.RUNNING)))

            do_sample = True
            if seq_group.is_prefill():
                seqs = seq_group.get_seqs()
                assert len(seqs) == 1
                # Sample only when the whole prompt is processed this chunk.
                if token_chunk_size + seqs[0].data.get_num_computed_tokens() \
                        < seqs[0].data.get_len():
                    do_sample = False

            is_prompt = seq_group.is_prefill()
            seq_group_metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=is_prompt,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                    do_sample=do_sample,
                    token_chunk_size=token_chunk_size,
                    lora_request=seq_group.lora_request,
                    computed_block_nums=common_computed_block_nums,
                    pooling_params=getattr(seq_group, "pooling_params",
                                           None),
                    multi_modal_data=getattr(seq_group, "multi_modal_data",
                                             None) if is_prompt else None,
                    eos_token_id=next(
                        iter(seq_group.seqs_dict.values())).eos_token_id,
                ))

        # Prefix blocks just scheduled are computed once this batch runs.
        for scheduled_seq_group in scheduler_outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(
                scheduled_seq_group.seq_group)

        return seq_group_metadata_list, scheduler_outputs
