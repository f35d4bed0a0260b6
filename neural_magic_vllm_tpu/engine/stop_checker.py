"""Stop-condition checking (reference vllm/engine/output_processor/stop_checker.py)."""
from typing import Optional

from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import Sequence, SequenceStatus


class StopChecker:

    def __init__(self, max_model_len: int) -> None:
        self.max_model_len = max_model_len

    def maybe_stop_sequence(self, seq: Sequence,
                            new_char_count: int,
                            sampling_params: SamplingParams) -> None:
        """Mark seq finished if any stop condition is met. new_char_count is
        the number of chars the latest token added to output_text (0 when
        detokenization is disabled)."""
        # min_tokens guard: no stop-token/eos/stop-string termination yet.
        output_len = seq.get_output_len()
        allow_stop = output_len >= sampling_params.min_tokens

        last_token = seq.get_last_token_id()
        if allow_stop and last_token in sampling_params.stop_token_ids:
            seq.status = SequenceStatus.FINISHED_STOPPED
            seq.stop_reason = last_token
            return
        if (allow_stop and not sampling_params.ignore_eos
                and seq.eos_token_id is not None
                and last_token == seq.eos_token_id):
            seq.status = SequenceStatus.FINISHED_STOPPED
            return
        if allow_stop and new_char_count and sampling_params.stop:
            stop_str = self._check_stop_strings(seq, new_char_count,
                                                sampling_params)
            if stop_str is not None:
                seq.status = SequenceStatus.FINISHED_STOPPED
                seq.stop_reason = stop_str
                return
        if seq.get_len() >= self.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if (sampling_params.max_tokens is not None
                and output_len >= sampling_params.max_tokens):
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

    @staticmethod
    def _check_stop_strings(seq: Sequence, new_char_count: int,
                            sampling_params: SamplingParams
                            ) -> Optional[str]:
        """Search for stop strings overlapping the newly added text; truncate
        output_text at the match (unless include_stop_str_in_output)."""
        for stop_str in sampling_params.stop:
            stop_len = len(stop_str)
            if sampling_params.include_stop_str_in_output:
                stop_index = seq.output_text.find(
                    stop_str, max(0,
                                  len(seq.output_text) - new_char_count -
                                  stop_len))
                if stop_index == -1:
                    continue
                seq.output_text = seq.output_text[:stop_index + stop_len]
                return stop_str
            start = max(0, len(seq.output_text) - new_char_count - stop_len)
            stop_index = seq.output_text.find(stop_str, start)
            if stop_index == -1:
                continue
            seq.output_text = seq.output_text[:stop_index]
            return stop_str
        return None
