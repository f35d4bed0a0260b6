"""Incremental detokenization.

Same contract as the reference detokenizer
(vllm/transformers_utils/detokenizer.py:13,224): streaming-safe decoding with
a prefix/read offset pair so multi-token unicode sequences are only emitted
once complete (the trailing replacement char "�" marks an incomplete
sequence).
"""
from typing import Dict, List, Optional, Tuple

from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import (Logprob, Sequence,
                                            SequenceGroup)

# Number of tokens to look back for the prefix when initializing.
INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


def _convert_tokens_to_string(tokenizer, tokens: List[str],
                              skip_special_tokens: bool,
                              spaces_between_special_tokens: bool) -> str:
    # Fast path: tokenizers with a native convert_tokens_to_string.
    special = set(tokenizer.all_special_tokens)
    sub_texts: List[str] = []
    current: List[str] = []
    for t in tokens:
        if t in special:
            if skip_special_tokens:
                continue
            if current:
                sub_texts.append(tokenizer.convert_tokens_to_string(current))
                current = []
            sub_texts.append(t)
        else:
            current.append(t)
    if current:
        sub_texts.append(tokenizer.convert_tokens_to_string(current))
    sep = " " if spaces_between_special_tokens else ""
    return sep.join(sub_texts)


def detokenize_incrementally(
    tokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Returns (new_tokens, new_decoded_text, new_prefix_offset,
    new_read_offset)."""
    if prev_tokens is None:
        new_tokens = tokenizer.convert_ids_to_tokens(
            all_input_ids, skip_special_tokens=skip_special_tokens)
        if isinstance(new_tokens, str):
            new_tokens = [new_tokens]
        output_tokens = new_tokens
        prefix_offset = max(
            len(output_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET,
            0)
        read_offset = max(len(output_tokens) - 1, 0)
    else:
        new_token_id = all_input_ids[-1]
        new_tokens = tokenizer.convert_ids_to_tokens(
            [new_token_id], skip_special_tokens=skip_special_tokens)
        if isinstance(new_tokens, str):
            new_tokens = [new_tokens]
        output_tokens = prev_tokens + new_tokens

    prefix_text = _convert_tokens_to_string(
        tokenizer, output_tokens[prefix_offset:read_offset],
        skip_special_tokens, spaces_between_special_tokens)
    new_text = _convert_tokens_to_string(
        tokenizer, output_tokens[prefix_offset:], skip_special_tokens,
        spaces_between_special_tokens)

    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        # Complete sequence: emit the delta, slide the window.
        delta = new_text[len(prefix_text):]
        return new_tokens, delta, read_offset, len(output_tokens)
    # Incomplete (mid-unicode): emit nothing, keep offsets.
    return new_tokens, "", prefix_offset, read_offset


class Detokenizer:
    """Per-sequence streaming detokenization
    (reference Detokenizer, detokenizer.py:224)."""

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer

    def decode_sequence_inplace(self, seq: Sequence,
                                params: SamplingParams) -> int:
        """Decode the latest token into seq.output_text; returns the number
        of new characters."""
        all_input_ids = seq.get_token_ids()
        token_id_generated_this_iteration = all_input_ids[-1]

        # Fast-start: only the output tokens need decoding context plus a
        # small tail of the prompt.
        if seq.tokens is None:
            context = all_input_ids[:-1][-INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET - 1:]
            (seq.tokens, _, seq.prefix_offset,
             seq.read_offset) = detokenize_incrementally(
                 self.tokenizer, context, None, 0, 0,
                 params.skip_special_tokens,
                 params.spaces_between_special_tokens)

        ids_tail = all_input_ids[-(len(seq.tokens) + 1):]
        new_tokens, new_text, prefix_offset, read_offset = \
            detokenize_incrementally(
                self.tokenizer, ids_tail, seq.tokens, seq.prefix_offset,
                seq.read_offset, params.skip_special_tokens,
                params.spaces_between_special_tokens)

        # Decode logprob tokens if requested.
        if seq.output_logprobs:
            latest = seq.output_logprobs[-1]
            for tid, lp in latest.items():
                if lp.decoded_token is None:
                    lp.decoded_token = self.tokenizer.decode(
                        [tid], skip_special_tokens=params.skip_special_tokens)

        seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_text
        return len(new_text)

    def decode_prompt_logprobs_inplace(self, seq_group: SequenceGroup,
                                       prompt_logprobs) -> None:
        for pos_lp in prompt_logprobs or []:
            if not pos_lp:
                continue
            for tid, lp in pos_lp.items():
                if lp.decoded_token is None:
                    lp.decoded_token = self.tokenizer.decode([tid])
