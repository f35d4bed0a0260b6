"""One guided processor instance is shared (via SamplingParams) across all
sibling sequences of an n>1 request; interleaved calls with divergent
prefixes must produce the same masks as independent processors
(regression: the cursor-based state corrupted sibling B after sibling A
advanced)."""
import numpy as np

from neural_magic_vllm_tpu.guided_decoding import FSMLogitsProcessor
from neural_magic_vllm_tpu.guided_decoding.fsm import RegexFSM
from tests.guided_decoding.test_fsm import VOCAB


def _mask(proc, ids, n):
    return proc(list(ids), np.zeros((n, ), np.float32))


def test_fsm_processor_interleaved_siblings():
    # asymmetric continuations: after "ab" only "a" may follow, after
    # "cd" only "c" — so sibling states produce DIFFERENT masks
    fsm = RegexFSM(r"aba|cdc", VOCAB)
    eos = 2
    n = len(VOCAB)
    ab = VOCAB.index("ab")
    cd = VOCAB.index("cd")

    shared = FSMLogitsProcessor(fsm, eos)
    solo_a = FSMLogitsProcessor(fsm, eos)
    solo_b = FSMLogitsProcessor(fsm, eos)

    seq_a, seq_b = [ab], [cd]
    ma = _mask(shared, seq_a, n)
    mb = _mask(shared, seq_b, n)
    np.testing.assert_array_equal(ma, _mask(solo_a, seq_a, n))
    np.testing.assert_array_equal(mb, _mask(solo_b, seq_b, n))
    # siblings really are in different states
    assert not np.array_equal(ma, mb)
    # continue both one more step, still interleaved
    seq_a, seq_b = seq_a + [VOCAB.index("a")], seq_b + [VOCAB.index("c")]
    np.testing.assert_array_equal(_mask(shared, seq_a, n),
                                  _mask(solo_a, seq_a, n))
    np.testing.assert_array_equal(_mask(shared, seq_b, n),
                                  _mask(solo_b, seq_b, n))


def test_cfg_processor_interleaved_siblings():
    from neural_magic_vllm_tpu.guided_decoding.cfg import (CFGLogitsProcessor,
                                                           CFGuide)
    # after "a" only "b" may follow; after "b" only "a"
    grammar = 'start: "a" "b" | "b" "a"'
    vocab = [None, "<s>", "</s>", "a", "b"]
    guide = CFGuide(grammar, vocab)
    eos = 2
    n = len(vocab)

    shared = CFGLogitsProcessor(guide, vocab, eos)
    solo_a = CFGLogitsProcessor(guide, vocab, eos)
    solo_b = CFGLogitsProcessor(guide, vocab, eos)

    a, b_ = 3, 4
    seq_a, seq_b = [a], [b_]
    ma = _mask(shared, seq_a, n)
    mb = _mask(shared, seq_b, n)
    np.testing.assert_array_equal(ma, _mask(solo_a, seq_a, n))
    np.testing.assert_array_equal(mb, _mask(solo_b, seq_b, n))
    assert not np.array_equal(ma, mb)
    seq_a, seq_b = seq_a + [b_], seq_b + [a]
    np.testing.assert_array_equal(_mask(shared, seq_a, n),
                                  _mask(solo_a, seq_a, n))
    np.testing.assert_array_equal(_mask(shared, seq_b, n),
                                  _mask(solo_b, seq_b, n))
