"""Regex-FSM fuzz: the compiled DFA must agree with Python's `re`
fullmatch on randomly generated patterns x random strings (the supported
subset: literals, classes, concat, alternation, ?, *, +, {m,n})."""
import random
import re

import pytest

from tests.guided_decoding.test_fsm import fsm_accepts
from neural_magic_vllm_tpu.guided_decoding.fsm import RegexFSM

ALPHABET = "abcd"


def _rand_pattern(rng, depth=0):
    r = rng.random()
    if depth >= 3 or r < 0.35:
        if rng.random() < 0.3:
            lo = rng.choice("ab")
            hi = rng.choice("cd")
            atom = f"[{lo}-{hi}]"
        else:
            atom = rng.choice(ALPHABET)
    elif r < 0.55:
        atom = "(" + _rand_pattern(rng, depth + 1) + "|" + \
            _rand_pattern(rng, depth + 1) + ")"
    else:
        atom = "(" + _rand_pattern(rng, depth + 1) + \
            _rand_pattern(rng, depth + 1) + ")"
    q = rng.random()
    if q < 0.15:
        atom += "*"
    elif q < 0.3:
        atom += "+"
    elif q < 0.4:
        atom += "?"
    elif q < 0.5:
        m = rng.randint(0, 2)
        n = m + rng.randint(0, 2)
        atom += f"{{{m},{n}}}"
    return atom


@pytest.mark.parametrize("seed", range(10))
def test_random_patterns_agree_with_re(seed):
    rng = random.Random(seed)
    for _ in range(25):
        pattern = _rand_pattern(rng)
        try:
            gold = re.compile(pattern)
        except re.error:
            continue
        fsm = RegexFSM(pattern, [None, "<s>"] + list(ALPHABET))
        # random probes + strings the pattern itself generates
        probes = ["".join(rng.choice(ALPHABET)
                          for _ in range(rng.randint(0, 8)))
                  for _ in range(40)]
        for s in probes:
            expect = gold.fullmatch(s) is not None
            got = fsm_accepts(fsm, s)
            assert got == expect, (pattern, s, expect, got)
