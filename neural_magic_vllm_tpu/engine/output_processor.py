"""Single-step output processor: appends sampled tokens, forks parallel
samples, detokenizes incrementally, checks stops, frees finished seqs
(reference vllm/engine/output_processor/single_step.py:18)."""
from typing import List, Optional

from neural_magic_vllm_tpu.core.scheduler import Scheduler
from neural_magic_vllm_tpu.engine.stop_checker import StopChecker
from neural_magic_vllm_tpu.sequence import (CompletionSequenceGroupOutput,
                                            SequenceGroup, SequenceStatus)
from neural_magic_vllm_tpu.transformers_utils.detokenizer import Detokenizer
from neural_magic_vllm_tpu.utils import Counter


class SingleStepOutputProcessor:

    def __init__(self, scheduler: Scheduler,
                 detokenizer: Optional[Detokenizer],
                 stop_checker: StopChecker, seq_counter: Counter) -> None:
        self.scheduler = scheduler
        self.detokenizer = detokenizer
        self.stop_checker = stop_checker
        self.seq_counter = seq_counter

    def can_fast_append(self, seq_group: SequenceGroup) -> bool:
        """True when the multi-step fast path applies: a single running
        sequence with no forking semantics (n=1, no beam), so K fused
        decode steps can append without per-step fork bookkeeping."""
        sp = seq_group.sampling_params
        return (sp is not None and sp.n == 1 and not sp.use_beam_search
                and len(seq_group.get_seqs(
                    status=SequenceStatus.RUNNING)) == 1)

    def process_outputs_multi(self, seq_group: SequenceGroup,
                              step_outputs) -> int:
        """Fast path for the fused multi-step decode dispatch: append
        each step's single sample to the lone running sequence, stopping
        at the first finish (over-generated tail tokens are dropped, same
        contract as the per-step path; reference
        output_processor/multi_step.py:20). Returns the number of steps
        actually applied. Caller must have checked can_fast_append."""
        seq = seq_group.get_seqs(status=SequenceStatus.RUNNING)[0]
        sp = seq_group.sampling_params
        detok = self.detokenizer if (self.detokenizer
                                     and sp.detokenize) else None
        applied = 0
        for output in step_outputs:
            if not output.samples:
                break  # variable-length fused steps (spec decode)
            sample = output.samples[0]
            seq.append_token_id(sample.output_token, sample.logprobs)
            applied += 1
            nc = detok.decode_sequence_inplace(seq, sp) if detok else 0
            self.stop_checker.maybe_stop_sequence(seq, nc, sp)
            if seq.is_finished():
                break
        if seq.is_finished():
            self.scheduler.free_seq(seq)
        return applied

    def process_outputs(self, seq_group: SequenceGroup,
                        output: CompletionSequenceGroupOutput) -> int:
        """Returns the number of tokens actually appended to sequences in
        this group (one per sample committed; 0 for mid-prompt chunks) —
        the engine accumulates this for the generation-token stat, which
        counts a finished prefill's first sampled token as generation,
        matching the reference split (reference llm_engine.py:993-995)."""
        if output.prompt_logprobs is not None:
            # chunked prefill: each chunk contributes its own positions,
            # concatenated here. A FIRST chunk (leads with None padding
            # for position 0 / cache-covered positions) resets the list —
            # that is how a RECOMPUTE-preempted prompt replays cleanly.
            incoming = output.prompt_logprobs
            if self.detokenizer and \
                    seq_group.sampling_params.detokenize:
                self.detokenizer.decode_prompt_logprobs_inplace(
                    seq_group, incoming)
            if seq_group.prompt_logprobs is None or \
                    (incoming and incoming[0] is None):
                seq_group.prompt_logprobs = list(incoming)
            else:
                seq_group.prompt_logprobs += incoming
        if not output.samples:
            return 0  # mid-prompt chunk: nothing sampled

        samples = output.samples
        parent_seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        parent_child: dict = {s.seq_id: [] for s in parent_seqs}
        for sample in samples:
            parent_child[sample.parent_seq_id].append(sample)

        sp = seq_group.sampling_params
        child_seqs = []
        dropped_parents = []
        for parent in parent_seqs:
            child_samples = parent_child[parent.seq_id]
            if not child_samples:
                # Beam search: no candidate continued this parent.
                dropped_parents.append(parent)
                continue
            # Fork for all but the last sample (parallel sampling n>1).
            for child_sample in child_samples[:-1]:
                new_child_seq_id = next(self.seq_counter)
                child = parent.fork(new_child_seq_id)
                child.append_token_id(child_sample.output_token,
                                      child_sample.logprobs)
                child_seqs.append((child, parent))
            last = child_samples[-1]
            parent.append_token_id(last.output_token, last.logprobs)
            child_seqs.append((parent, parent))

        for seq, _ in child_seqs:
            if self.detokenizer and sp.detokenize:
                new_char_count = self.detokenizer.decode_sequence_inplace(
                    seq, sp)
            else:
                new_char_count = 0
            self.stop_checker.maybe_stop_sequence(seq, new_char_count, sp)

        # Register forked children with the group + block manager.
        for seq, parent in child_seqs:
            if seq is not parent:
                seq_group.add(seq)
                if not seq.is_finished():
                    self.scheduler.fork_seq(parent, seq)

        for parent in dropped_parents:
            seq_group.remove(parent.seq_id)
            self.scheduler.free_seq(parent)

        if sp.use_beam_search:
            self._beam_select(seq_group, child_seqs, sp)

        for seq, parent in child_seqs:
            if seq is parent and seq.is_finished():
                self.scheduler.free_seq(seq)
            if seq is not parent and seq.is_finished():
                self.scheduler.free_seq(seq)
        return len(child_seqs)

    def _beam_select(self, seq_group: SequenceGroup, child_seqs,
                     sp) -> None:
        """Keep the best beam_width running beams + best beam_width
        finished candidates; decide early stopping (reference
        single_step.py beam logic + _check_beam_search_early_stopping)."""
        bw = sp.best_of
        lp = sp.length_penalty

        def score(seq):
            return seq.get_beam_search_score(lp)

        finished = [s for s in seq_group.get_seqs() if s.is_finished()]
        finished.sort(key=score, reverse=True)
        for seq in finished[bw:]:  # outcompeted finished beams
            seq_group.remove(seq.seq_id)

        running = [s for s, _ in child_seqs if not s.is_finished()]
        running.sort(key=lambda s: s.get_cumulative_logprob(), reverse=True)
        keep, drop = running[:bw], running[bw:]
        for seq in drop:
            seq_group.remove(seq.seq_id)
            self.scheduler.free_seq(seq)

        kept_finished = [s for s in seq_group.get_seqs()
                         if s.is_finished()]
        stop_all = False
        if len(kept_finished) >= bw and keep:
            if sp.early_stopping is True:
                stop_all = True
            elif sp.early_stopping is False:
                worst_finished = min(score(s) for s in kept_finished)
                best_running = max(score(s) for s in keep)
                stop_all = worst_finished >= best_running
            # "never": run until length/eos stops every beam
        if stop_all:
            from neural_magic_vllm_tpu.sequence import SequenceStatus
            for seq in keep:
                seq.status = SequenceStatus.FINISHED_STOPPED
                seq_group.remove(seq.seq_id)
                self.scheduler.free_seq(seq)
