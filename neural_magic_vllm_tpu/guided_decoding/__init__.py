"""Guided decoding (reference vllm/model_executor/guided_decoding/):
regex/JSON-schema/choice-constrained generation as SamplingParams
logits_processors — engine-agnostic host-side masking, exactly like the
reference's outlines backend, but with a self-contained FSM (no outlines
dependency in this environment)."""
import json
import math
import re
from typing import Dict, List, Optional

import numpy as np

from neural_magic_vllm_tpu.guided_decoding.fsm import RegexFSM
from neural_magic_vllm_tpu.guided_decoding.json_schema import schema_to_regex

_FSM_CACHE: Dict[tuple, RegexFSM] = {}


def _vocab_strings(tokenizer) -> List[Optional[str]]:
    cached = getattr(tokenizer, "_nmv_vocab_strings", None)
    if cached is not None:
        return cached
    size = getattr(tokenizer, "vocab_size", None) or len(
        tokenizer.get_vocab())
    vocab = tokenizer.get_vocab()
    max_id = max(vocab.values()) + 1
    strings: List[Optional[str]] = [None] * max(size, max_id)
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    for tid in range(len(strings)):
        if tid in special:
            continue
        try:
            text = tokenizer.decode([tid])
        except Exception:  # noqa: BLE001
            continue
        if text and "�" not in text:
            strings[tid] = text
    tokenizer._nmv_vocab_strings = strings
    return strings


class FSMLogitsProcessor:
    """Per-request stateful mask (reference RegexLogitsProcessor,
    outlines_logits_processors.py:67). Called as (generated_ids, logits) ->
    logits with disallowed tokens set to -inf; EOS is allowed once the FSM
    is in an accepting state."""

    def __init__(self, fsm: RegexFSM, eos_token_id: Optional[int]) -> None:
        self.fsm = fsm
        self.eos_token_id = eos_token_id
        # States are keyed by the generated-token prefix, NOT kept as a
        # single cursor: one processor instance sits on the request's
        # shared SamplingParams, and with n>1/best_of>1 the sampler calls
        # it with each sibling sequence's divergent ids.
        self._states: Dict[tuple, Optional[int]] = {(): fsm.start}

    def _dstate_for(self, dfsm, ids: List[int]) -> int:
        """Prefix-memoized walk over the compressed DeviceFSM tables
        (same amortized-O(1) contract as _state_for; a stateless replay
        was O(n^2) over a generation — review r5 #6)."""
        if not hasattr(self, "_dstates"):
            self._dstates = {(): dfsm.start}
        key = tuple(ids)
        if key in self._dstates:
            return self._dstates[key]
        i = len(ids)
        while i > 0 and tuple(ids[:i]) not in self._dstates:
            i -= 1
        state = self._dstates[tuple(ids[:i])]
        for tid in ids[i:]:
            state = dfsm.advance(state, int(tid))
            i += 1
            self._dstates[tuple(ids[:i])] = state
        return state

    def _state_for(self, ids: List[int]) -> Optional[int]:
        key = tuple(ids)
        if key in self._states:
            return self._states[key]
        i = len(ids)
        while i > 0 and tuple(ids[:i]) not in self._states:
            i -= 1
        state = self._states[tuple(ids[:i])]
        for tid in ids[i:]:
            if state is not None and tid != self.eos_token_id:
                state = self.fsm.allowed_tokens(state).get(tid)
            i += 1
            self._states[tuple(ids[:i])] = state
        return state

    def __call__(self, generated_ids: List[int],
                 logits: np.ndarray) -> np.ndarray:
        # Fast path: when the worker has materialized this FSM for the
        # fused on-device dispatch (guided_decoding/device_fsm.py), reuse
        # its compressed tables here too — a stateless numpy walk +
        # bitmask row, instead of the lazy per-state 0.5 s/state token
        # walk. Masks are identical by construction (tested in
        # tests/guided_decoding/test_device_fsm.py).
        dfsm = getattr(self.fsm, "_device_fsm", None)
        if dfsm and dfsm.eos_token_id == self.eos_token_id:
            state = self._dstate_for(dfsm, generated_ids)
            row = dfsm.allowed_row(state)
            mask = np.full_like(logits, -math.inf)
            n = min(logits.shape[-1], row.shape[0])
            idx = np.nonzero(row[:n])[0]
            mask[idx] = logits[idx]
            return mask
        self._state = self._state_for(generated_ids)
        if self._state is None:
            # walked off the automaton (shouldn't happen): only EOS
            mask = np.full_like(logits, -math.inf)
            if self.eos_token_id is not None:
                mask[self.eos_token_id] = logits[self.eos_token_id]
            return mask
        allowed = self.fsm.allowed_tokens(self._state)
        mask = np.full_like(logits, -math.inf)
        idx = np.fromiter(allowed.keys(), dtype=np.int64,
                          count=len(allowed))
        if idx.size:
            mask[idx] = logits[idx]
        if self.eos_token_id is not None and \
                self.fsm.is_accepting(self._state):
            mask[self.eos_token_id] = logits[self.eos_token_id]
        return mask


_FSM_CACHE_CAP = 128


def _get_fsm(pattern: str, tokenizer) -> RegexFSM:
    key = (pattern, id(tokenizer))
    fsm = _FSM_CACHE.get(key)
    if fsm is None:
        # bounded FIFO: each entry can pin tens of MB of host tables
        # once its DeviceFSM materializes (review r5 #7)
        while len(_FSM_CACHE) >= _FSM_CACHE_CAP:
            _FSM_CACHE.pop(next(iter(_FSM_CACHE)))
        fsm = RegexFSM(pattern, _vocab_strings(tokenizer))
        _FSM_CACHE[key] = fsm
    return fsm


_CFG_CACHE: Dict[tuple, object] = {}

# Arbitrary-JSON grammar for OpenAI ``response_format={"type":
# "json_object"}`` (reference outlines_decoding.py:29 JSON_GRAMMAR; like
# the reference, the top level must be an object or array).
JSON_GRAMMAR = r"""
start: ws root ws
root: object | array
value: object | array | string | number | "true" | "false" | "null"
object: "{" ws "}" | "{" members "}"
members: pair | pair "," members
pair: ws string ws ":" ws value ws
array: "[" ws "]" | "[" items "]"
items: item | item "," items
item: ws value ws
string: "\"" char* "\""
char: [^"\\] | "\\" esc
esc: ["\\/bfnrt] | "u" hex hex hex hex
hex: [0-9a-fA-F]
number: "-"? intp frac? exp?
intp: "0" | [1-9] [0-9]*
frac: "." [0-9]+
exp: [eE] sign? [0-9]+
sign: "+" | "-"
ws: [ \t\n\r]*
"""


def _adapt_request_for_tool_use(request) -> None:
    """Named ``tool_choice`` constrains the output to the chosen
    function's parameter schema (reference
    guided_decoding/__init__.py:31 _adapt_request_for_tool_use)."""
    tool_choice = getattr(request, "tool_choice", None)
    if tool_choice is None or tool_choice == "none" or \
            getattr(request, "guided_json", None):
        return
    name = tool_choice.function.name
    tools = {t.function.name: t.function
             for t in (getattr(request, "tools", None) or [])}
    if name not in tools:
        raise ValueError(f"Tool '{name}' has not been passed in `tools`.")
    request.guided_json = tools[name].parameters or {"type": "object"}


def _cfg_processors(grammar: str, tokenizer) -> list:
    if tokenizer is None:
        raise ValueError("guided decoding requires a tokenizer")
    from neural_magic_vllm_tpu.guided_decoding.cfg import (
        CFGLogitsProcessor, CFGuide)
    strings = _vocab_strings(tokenizer)
    key = (grammar, id(tokenizer))
    guide = _CFG_CACHE.get(key)
    if guide is None:
        guide = CFGuide(grammar, strings)
        _CFG_CACHE[key] = guide
    eos = getattr(tokenizer, "eos_token_id", None)
    return [CFGLogitsProcessor(guide, strings, eos)]


def get_guided_decoding_logits_processors(request, tokenizer
                                          ) -> Optional[list]:
    """Build processors from a request carrying guided_json / guided_regex /
    guided_choice / guided_grammar (reference
    guided_decoding/__init__.py:13; CFG backend
    outlines_logits_processors.py:126)."""
    _adapt_request_for_tool_use(request)
    if getattr(request, "guided_grammar", None):
        return _cfg_processors(request.guided_grammar, tokenizer)
    pattern = None
    if getattr(request, "guided_json", None):
        pattern = schema_to_regex(request.guided_json)
    elif getattr(request, "guided_regex", None):
        pattern = request.guided_regex
    elif getattr(request, "guided_choice", None):
        pattern = "(" + "|".join(
            re.escape(c) for c in request.guided_choice) + ")"
    rf = getattr(request, "response_format", None)
    if pattern is None and rf is not None and \
            getattr(rf, "type", None) == "json_object":
        return _cfg_processors(JSON_GRAMMAR, tokenizer)
    if pattern is None:
        return None
    if tokenizer is None:
        raise ValueError("guided decoding requires a tokenizer")
    fsm = _get_fsm(pattern, tokenizer)
    eos = getattr(tokenizer, "eos_token_id", None)
    return [FSMLogitsProcessor(fsm, eos)]
