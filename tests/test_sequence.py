"""Sequence data-model unit tests (reference tests/test_sequence.py)."""
import pytest

from neural_magic_vllm_tpu.sequence import (Logprob, Sequence, SequenceData,
                                            SequenceGroup, SequenceStage,
                                            SequenceStatus)
from neural_magic_vllm_tpu.sampling_params import SamplingParams


def _make_seq(seq_id=0, prompt_ids=(1, 2, 3, 4), block_size=16):
    return Sequence(seq_id=seq_id, prompt="p",
                    prompt_token_ids=list(prompt_ids),
                    block_size=block_size, eos_token_id=2)


def test_sequence_data_lifecycle():
    data = SequenceData([1, 2, 3, 4])
    assert data.get_len() == 4
    assert data.get_prompt_len() == 4
    assert data.get_output_len() == 0
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_uncomputed_tokens() == 4

    data.update_num_computed_tokens(2)
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_uncomputed_tokens() == 2
    data.update_num_computed_tokens(2)
    assert data.stage == SequenceStage.DECODE

    data.append_token_id(7, logprob=-0.5)
    assert data.get_len() == 5
    assert data.get_output_len() == 1
    assert data.get_last_token_id() == 7
    assert data.get_token_ids() == [1, 2, 3, 4, 7]
    assert data.cumulative_logprob == pytest.approx(-0.5)

    data.reset_state_for_recompute()
    assert data.stage == SequenceStage.PREFILL
    assert data.get_num_uncomputed_tokens() == 5


def test_sequence_append_and_fork():
    seq = _make_seq()
    seq.data.update_num_computed_tokens(4)
    seq.append_token_id(9, {9: Logprob(-1.0)})
    assert seq.get_output_token_ids() == [9]
    assert seq.get_cumulative_logprob() == pytest.approx(-1.0)

    child = seq.fork(new_seq_id=42)
    assert child.seq_id == 42
    assert child.get_token_ids() == seq.get_token_ids()
    child.append_token_id(5, {5: Logprob(-0.1)})
    assert seq.get_output_len() == 1  # parent untouched
    assert child.get_output_len() == 2


def test_num_new_tokens_by_stage():
    seq = _make_seq(prompt_ids=range(10))
    assert seq.is_prefill() and seq.get_num_new_tokens() == 10
    seq.data.update_num_computed_tokens(6)
    assert seq.get_num_new_tokens() == 4  # chunked-prefill remainder
    seq.data.update_num_computed_tokens(4)
    assert not seq.is_prefill() and seq.get_num_new_tokens() == 1


def test_sequence_status_finished():
    seq = _make_seq()
    assert not seq.is_finished()
    for status, reason in ((SequenceStatus.FINISHED_STOPPED, "stop"),
                           (SequenceStatus.FINISHED_LENGTH_CAPPED, "length"),
                           (SequenceStatus.FINISHED_ABORTED, "abort")):
        seq.status = status
        assert seq.is_finished()
        assert SequenceStatus.get_finished_reason(status) == reason
    assert SequenceStatus.get_finished_reason(SequenceStatus.RUNNING) is None


def test_beam_search_score_length_penalty():
    seq = _make_seq()
    seq.data.update_num_computed_tokens(4)
    seq.append_token_id(9, {9: Logprob(-2.0)})
    seq.append_token_id(8, {8: Logprob(-2.0)})
    # score = cumlogprob / len**penalty
    assert seq.get_beam_search_score(1.0) == pytest.approx(-4.0 / 6)
    assert seq.get_beam_search_score(0.0) == pytest.approx(-4.0)
    # trailing EOS excluded from the normalizing length
    seq.append_token_id(2, {2: Logprob(-1.0)})
    assert seq.get_beam_search_score(1.0, eos_token_id=2) == \
        pytest.approx(-5.0 / 6)


def test_sequence_group_seq_queries():
    seqs = [_make_seq(i) for i in range(3)]
    group = SequenceGroup(request_id="r", seqs=seqs, arrival_time=0.0,
                          sampling_params=SamplingParams(n=3,
                                                         temperature=1.0))
    assert group.get_max_num_running_seqs() >= 3
    assert len(group.get_seqs()) == 3
    seqs[0].status = SequenceStatus.FINISHED_STOPPED
    assert len(group.get_unfinished_seqs()) == 2
    assert len(group.get_finished_seqs()) == 1
    assert not group.is_finished()
    for s in seqs:
        s.status = SequenceStatus.FINISHED_STOPPED
    assert group.is_finished()
