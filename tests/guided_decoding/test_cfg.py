"""CFG guided decoding: grammar parsing, Earley recognition, token-trie
masking, and engine integration (reference CFGLogitsProcessor,
outlines_logits_processors.py:126)."""
import numpy as np
import pytest

from neural_magic_vllm_tpu.guided_decoding.cfg import (CFGLogitsProcessor,
                                                       CFGuide,
                                                       GrammarError)

BALANCED = """
s: "(" s ")" s |
"""

ARITH = """
expr: term | expr "+" term
term: num | "(" expr ")"
num: [0-9]+
"""

JSONG = """
value: object | array | string | number | "true" | "false" | "null"
object: "{" "}" | "{" members "}"
members: pair | pair "," members
pair: string ":" value
array: "[" "]" | "[" elements "]"
elements: value | value "," elements
string: "\\"" chars "\\""
chars: [a-zA-Z0-9_ ]*
number: "-"? [0-9]+ ("." [0-9]+)?
"""


def _accepts(guide, text):
    charts = guide.initial
    for ch in text:
        charts = guide.advance(charts, ch)
        if charts is None:
            return False
    return guide.accepts(charts)


def test_earley_recognition():
    g = CFGuide(BALANCED, [])
    assert _accepts(g, "")
    assert _accepts(g, "()")
    assert _accepts(g, "(())()")
    assert not _accepts(g, "(()")
    assert not _accepts(g, ")(")

    g = CFGuide(ARITH, [])
    assert _accepts(g, "1+2")
    assert _accepts(g, "(1+23)+4")
    assert not _accepts(g, "1+")
    assert not _accepts(g, "+1")

    g = CFGuide(JSONG, [])
    assert _accepts(g, '{"a":1,"b":[true,null]}')
    assert _accepts(g, '{"x":{"y":"z"}}')
    assert _accepts(g, "-3.25")
    assert not _accepts(g, '{"a":}')
    assert not _accepts(g, "{")


def test_grammar_errors():
    with pytest.raises(GrammarError):
        CFGuide("s: t", [])  # undefined rule
    with pytest.raises(GrammarError):
        CFGuide("", [])


def test_token_masking():
    vocab = ["(", ")", "(()", "((", "x", "()", None]
    guide = CFGuide(BALANCED, vocab)
    proc = CFGLogitsProcessor(guide, vocab, eos_token_id=6)
    logits = np.zeros((len(vocab), ), np.float32)
    out = proc([], logits)
    finite = {i for i in range(len(vocab)) if np.isfinite(out[i])}
    # "(", "((", "(()", "()" valid prefixes; ")" and "x" are not; EOS
    # allowed (empty string is in the language)
    assert finite == {0, 2, 3, 5, 6}
    # after "((": need closers before EOS
    out2 = proc([3], logits)
    finite2 = {i for i in range(len(vocab)) if np.isfinite(out2[i])}
    assert 1 in finite2 and 6 not in finite2 and 4 not in finite2


def test_engine_grammar_constrained_generation(tmp_path):
    """End to end: sampled output must parse under the grammar."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests"))
    from utils import create_tiny_llama_checkpoint
    from neural_magic_vllm_tpu import LLM, SamplingParams
    from neural_magic_vllm_tpu.guided_decoding import \
        get_guided_decoding_logits_processors

    model_dir = create_tiny_llama_checkpoint(str(tmp_path / "tiny"))
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              enforce_eager=True)
    tok = llm.llm_engine.tokenizer

    class Req:
        guided_grammar = ARITH

    procs = get_guided_decoding_logits_processors(Req(), tok)
    outs = llm.generate(
        ["Write an expression:"],
        SamplingParams(temperature=1.0, seed=0, max_tokens=24,
                       logits_processors=procs))
    text = outs[0].outputs[0].text
    guide = CFGuide(ARITH, [])
    assert text and _accepts(guide, text), text
