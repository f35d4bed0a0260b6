"""Guided-decoding FSM tests: the DFA must accept exactly what Python's re
accepts on the same (subset) patterns, and the token index must only allow
walkable tokens."""
import json
import re

import numpy as np
import pytest

from neural_magic_vllm_tpu.guided_decoding.fsm import RegexFSM
from neural_magic_vllm_tpu.guided_decoding.json_schema import schema_to_regex

VOCAB = [None, "<s>", "</s>"] + list("abcdefgh0123456789-.,\"{}[]: ") + \
    ["ab", "cd", "12", "34", "true", "false", "null", '"a"', "0.5"]


def fsm_accepts(fsm: RegexFSM, text: str) -> bool:
    state = fsm.start
    for ch in text:
        state = fsm.step_char(state, ch)
        if state is None:
            return False
    return fsm.is_accepting(state)


@pytest.mark.parametrize("pattern,good,bad", [
    (r"abc", ["abc"], ["ab", "abcd", "abd"]),
    (r"a+b*", ["a", "aab", "abbb"], ["", "b", "ba"]),
    (r"(ab|cd)+", ["ab", "abcd", "cdcdab"], ["", "ac", "abc"]),
    (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "ad"]),
    (r"a?b", ["b", "ab"], ["aab", "a", ""]),
    (r"(-)?(0|[1-9][0-9]*)", ["0", "-5", "123"], ["", "01", "--1", "1a"]),
    (r"[^ab]c", ["cc", "dc", "0c"], ["ac", "bc", "c"]),
    (r"a{3}", ["aaa"], ["aa", "aaaa"]),
    (r"a{2,}", ["aa", "aaaaa"], ["a", ""]),
    (r"\d+\.\d+", ["1.5", "10.25"], ["1.", ".5", "1"]),
])
def test_fsm_matches_re(pattern, good, bad):
    fsm = RegexFSM(pattern, VOCAB)
    for text in good:
        assert re.fullmatch(pattern, text), f"test vector bad: {text}"
        assert fsm_accepts(fsm, text), (pattern, text)
    for text in bad:
        assert not re.fullmatch(pattern, text)
        assert not fsm_accepts(fsm, text), (pattern, text)


def test_token_index_walks_multichar_tokens():
    fsm = RegexFSM(r"abcd", VOCAB)
    allowed = fsm.allowed_tokens(fsm.start)
    texts = {VOCAB[t] for t in allowed}
    assert "a" in texts and "ab" in texts
    assert "cd" not in texts
    nxt = allowed[VOCAB.index("ab")]
    allowed2 = fsm.allowed_tokens(nxt)
    assert "cd" in {VOCAB[t] for t in allowed2}


def test_json_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age"],
    }
    pattern = schema_to_regex(schema)
    good = '{"name": "bob", "age": 4, "tags": ["a", "b"]}'
    assert re.fullmatch(pattern, good), pattern
    assert re.fullmatch(pattern, '{"name": "x", "age": 0}')
    assert not re.fullmatch(pattern, '{"age": 4}')
    assert not re.fullmatch(pattern, '{"name": 3, "age": 4}')
    # and our FSM agrees
    fsm = RegexFSM(pattern, VOCAB)
    assert fsm_accepts(fsm, '{"age": 4}') is False
    assert fsm_accepts(fsm, '{"name": "a", "age": 12}')


def test_logits_processor_end_to_end():
    from neural_magic_vllm_tpu.guided_decoding import FSMLogitsProcessor
    fsm = RegexFSM(r"(true|false)", VOCAB)
    eos = 2
    proc = FSMLogitsProcessor(fsm, eos_token_id=eos)
    V = len(VOCAB)
    logits = np.zeros((V, ), np.float32)
    out = proc([], logits)
    allowed = {i for i in range(V) if np.isfinite(out[i])}
    assert VOCAB.index("true") in allowed
    assert VOCAB.index("f") in allowed  # prefix of "false"
    assert eos not in allowed  # not accepting yet
    # generate "true" -> accepting, EOS allowed
    out2 = proc([VOCAB.index("true")], logits)
    assert np.isfinite(out2[eos])


def test_choice_processor_via_request():
    from neural_magic_vllm_tpu.guided_decoding import \
        get_guided_decoding_logits_processors

    class FakeTok:
        vocab_size = len(VOCAB)
        eos_token_id = 2
        all_special_ids = [1, 2]

        def get_vocab(self):
            return {f"t{i}": i for i in range(len(VOCAB))}

        def decode(self, ids):
            return VOCAB[ids[0]] or ""

    class Req:
        guided_json = None
        guided_regex = None
        guided_choice = ["ab", "cd"]

    procs = get_guided_decoding_logits_processors(Req(), FakeTok())
    assert procs and len(procs) == 1
    logits = np.zeros((len(VOCAB), ), np.float32)
    out = procs[0]([], logits)
    finite = {i for i in range(len(VOCAB)) if np.isfinite(out[i])}
    assert VOCAB.index("ab") in finite
    assert VOCAB.index("a") in finite
    assert VOCAB.index("e") not in finite
