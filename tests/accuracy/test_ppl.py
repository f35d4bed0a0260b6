"""Perplexity parity: the engine's prompt-logprob-based perplexity must
match HF transformers on the same checkpoint within tight tolerance (the
reference's lm-eval rtol=0.02 criterion, tests/accuracy/
test_lm_eval_correctness.py:26, applied to the metric computable without
network egress)."""
import sys

import numpy as np
import pytest


def test_engine_ppl_matches_hf(tiny_llama_dir):
    sys.path.insert(0, "benchmarks")
    from eval_ppl import engine_ppl, hf_ppl

    rng = np.random.default_rng(0)
    ids = [1] + rng.integers(3, 500, size=200).tolist()
    e_ppl, e_n = engine_ppl(tiny_llama_dir, ids, max_len=128, stride=64)
    h_ppl, h_n = hf_ppl(tiny_llama_dir, ids, stride=64)
    assert e_n == h_n
    assert abs(e_ppl - h_ppl) / h_ppl < 0.02, (e_ppl, h_ppl)
