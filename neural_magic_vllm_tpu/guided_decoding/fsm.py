"""Regex -> NFA -> lazy DFA over the token vocabulary.

Self-contained reimplementation of the machinery the reference gets from the
`outlines` library (vllm/model_executor/guided_decoding/
outlines_logits_processors.py:30-148): a character-level automaton compiled
from a regex, plus a per-DFA-state index of which TOKENS (multi-character)
are allowed — computed lazily by walking each candidate token's characters
from the state and cached.

Supported regex subset (covers guided_choice, guided_json and typical
guided_regex uses): literals, escapes, ., character classes [...] (ranges,
negation), groups (...), alternation |, quantifiers * + ? {m}, {m,}, {m,n}.
"""
from typing import Dict, FrozenSet, List, Optional, Sequence, Set, Tuple

_EPS = None  # epsilon edge label


class _NFA:
    def __init__(self) -> None:
        self.transitions: List[List[Tuple[Optional[FrozenSet[str]], int]]] \
            = []

    def new_state(self) -> int:
        self.transitions.append([])
        return len(self.transitions) - 1

    def add_edge(self, src: int, label: Optional[FrozenSet[str]],
                 dst: int) -> None:
        self.transitions[src].append((label, dst))


_PRINTABLE = frozenset(chr(c) for c in range(32, 127)) | frozenset("\t\n\r")
# extend with common non-ascii bytes seen in tokenizer vocabs
_ANY = _PRINTABLE | frozenset(chr(c) for c in range(128, 0x2500))

_ESCAPES = {
    "d": frozenset("0123456789"),
    "D": _ANY - frozenset("0123456789"),
    "w": frozenset("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
    "s": frozenset(" \t\n\r\f\v"),
    "n": frozenset("\n"),
    "t": frozenset("\t"),
    "r": frozenset("\r"),
}
_ESCAPES["W"] = _ANY - _ESCAPES["w"]
_ESCAPES["S"] = _ANY - _ESCAPES["s"]


class _Parser:
    """Recursive-descent regex parser building NFA fragments
    (Thompson construction)."""

    def __init__(self, pattern: str, nfa: _NFA) -> None:
        self.p = pattern
        self.i = 0
        self.nfa = nfa

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    # fragment = (start, end)
    def parse(self) -> Tuple[int, int]:
        frag = self._alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i}")
        return frag

    def _alternation(self) -> Tuple[int, int]:
        frags = [self._concat()]
        while self.peek() == "|":
            self.eat()
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s, e = self.nfa.new_state(), self.nfa.new_state()
        for fs, fe in frags:
            self.nfa.add_edge(s, _EPS, fs)
            self.nfa.add_edge(fe, _EPS, e)
        return s, e

    def _concat(self) -> Tuple[int, int]:
        frags = []
        while self.peek() not in (None, "|", ")"):
            frags.append(self._repeat())
        if not frags:
            s = self.nfa.new_state()
            return s, s
        for (s1, e1), (s2, _) in zip(frags, frags[1:]):
            self.nfa.add_edge(e1, _EPS, s2)
        return frags[0][0], frags[-1][1]

    def _repeat(self) -> Tuple[int, int]:
        frag = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.eat()
                frag = self._star(frag)
            elif ch == "+":
                self.eat()
                s2, e2 = self._star(self._clone(frag))
                self.nfa.add_edge(frag[1], _EPS, s2)
                frag = (frag[0], e2)
            elif ch == "?":
                self.eat()
                self.nfa.add_edge(frag[0], _EPS, frag[1])
            elif ch == "{":
                frag = self._bounded(frag)
            else:
                return frag

    def _star(self, frag: Tuple[int, int]) -> Tuple[int, int]:
        s, e = self.nfa.new_state(), self.nfa.new_state()
        self.nfa.add_edge(s, _EPS, frag[0])
        self.nfa.add_edge(s, _EPS, e)
        self.nfa.add_edge(frag[1], _EPS, frag[0])
        self.nfa.add_edge(frag[1], _EPS, e)
        return s, e

    def _clone(self, frag: Tuple[int, int]) -> Tuple[int, int]:
        """Deep-copy the subgraph reachable from frag[0] up to frag[1]."""
        mapping: Dict[int, int] = {}
        stack = [frag[0]]
        mapping[frag[0]] = self.nfa.new_state()
        while stack:
            st = stack.pop()
            for label, dst in list(self.nfa.transitions[st]):
                if dst not in mapping:
                    mapping[dst] = self.nfa.new_state()
                    stack.append(dst)
                self.nfa.add_edge(mapping[st], label, mapping[dst])
        return mapping[frag[0]], mapping[frag[1]]

    def _bounded(self, frag: Tuple[int, int]) -> Tuple[int, int]:
        self.eat()  # {
        spec = ""
        while self.peek() not in (None, "}"):
            spec += self.eat()
        if self.peek() != "}":
            raise ValueError("unterminated {m,n}")
        self.eat()
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s else None
        else:
            lo = hi = int(spec)
        # {m,n} = m mandatory copies + (n-m) skippable copies;
        # {m,}  = m mandatory copies + one starred copy.
        # All clones are made BEFORE wiring (cloning walks outgoing edges,
        # so a fragment must not be cloned after edges are attached to it).
        n_copies = max(hi if hi is not None else lo + 1, 1)
        copies = [frag] + [self._clone(frag) for _ in range(n_copies - 1)]
        start = self.nfa.new_state()
        end = start
        for j in range(lo):
            f = copies[j]
            self.nfa.add_edge(end, _EPS, f[0])
            end = f[1]
        if hi is None:
            st = self._star(copies[lo])
            self.nfa.add_edge(end, _EPS, st[0])
            end = st[1]
        else:
            for j in range(lo, hi):
                f = copies[j]
                new_end = self.nfa.new_state()
                self.nfa.add_edge(end, _EPS, f[0])
                self.nfa.add_edge(f[1], _EPS, new_end)
                self.nfa.add_edge(end, _EPS, new_end)
                end = new_end
        return start, end

    def _atom(self) -> Tuple[int, int]:
        ch = self.eat()
        if ch == "(":
            if self.peek() == "?":  # (?:...) non-capturing
                self.eat()
                if self.peek() == ":":
                    self.eat()
            frag = self._alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced (")
            self.eat()
            return frag
        if ch == "[":
            return self._char_class()
        if ch == ".":
            return self._edge(_ANY)
        if ch == "\\":
            esc = self.eat()
            if esc in _ESCAPES:
                return self._edge(_ESCAPES[esc])
            return self._edge(frozenset(esc))
        if ch in "*+?{":
            raise ValueError(f"dangling quantifier {ch!r}")
        return self._edge(frozenset(ch))

    def _edge(self, chars: FrozenSet[str]) -> Tuple[int, int]:
        s, e = self.nfa.new_state(), self.nfa.new_state()
        self.nfa.add_edge(s, chars, e)
        return s, e

    def _char_class(self) -> Tuple[int, int]:
        negate = False
        if self.peek() == "^":
            self.eat()
            negate = True
        chars: Set[str] = set()
        prev: Optional[str] = None
        while self.peek() not in (None, "]"):
            ch = self.eat()
            if ch == "\\":
                esc = self.eat()
                if esc in _ESCAPES:
                    chars |= _ESCAPES[esc]
                    prev = None
                    continue
                ch = esc
            if ch == "-" and prev is not None and self.peek() not in (None,
                                                                      "]"):
                hi = self.eat()
                if hi == "\\":
                    hi = self.eat()
                chars |= {chr(c) for c in range(ord(prev), ord(hi) + 1)}
                prev = None
                continue
            chars.add(ch)
            prev = ch
        if self.peek() != "]":
            raise ValueError("unbalanced [")
        self.eat()
        return self._edge(frozenset(_ANY - chars if negate else chars))


class RegexFSM:
    """Lazy-subset-construction DFA with a per-state allowed-token index."""

    def __init__(self, pattern: str,
                 vocab: Sequence[Optional[str]]) -> None:
        self.nfa = _NFA()
        parser = _Parser(pattern, self.nfa)
        start, accept = parser.parse()
        self.accept_nfa = accept
        self.vocab = vocab
        self._dfa_states: Dict[FrozenSet[int], int] = {}
        self._dfa_list: List[FrozenSet[int]] = []
        self._char_step_cache: Dict[Tuple[int, str], Optional[int]] = {}
        self._token_index: Dict[int, Dict[int, int]] = {}
        self.start = self._dfa_id(self._closure({start}))

    def _closure(self, states: Set[int]) -> FrozenSet[int]:
        stack = list(states)
        out = set(states)
        while stack:
            st = stack.pop()
            for label, dst in self.nfa.transitions[st]:
                if label is _EPS and dst not in out:
                    out.add(dst)
                    stack.append(dst)
        return frozenset(out)

    def _dfa_id(self, closure: FrozenSet[int]) -> int:
        sid = self._dfa_states.get(closure)
        if sid is None:
            sid = len(self._dfa_list)
            self._dfa_states[closure] = sid
            self._dfa_list.append(closure)
        return sid

    def step_char(self, state: int, ch: str) -> Optional[int]:
        key = (state, ch)
        hit = self._char_step_cache.get(key, -1)
        if hit != -1:
            return hit
        nxt: Set[int] = set()
        for st in self._dfa_list[state]:
            for label, dst in self.nfa.transitions[st]:
                if label is not _EPS and ch in label:
                    nxt.add(dst)
        result = self._dfa_id(self._closure(nxt)) if nxt else None
        self._char_step_cache[key] = result
        return result

    def is_accepting(self, state: int) -> bool:
        return self.accept_nfa in self._dfa_list[state]

    def step_token(self, state: int, token_text: str) -> Optional[int]:
        s: Optional[int] = state
        for ch in token_text:
            s = self.step_char(s, ch)
            if s is None:
                return None
        return s

    def allowed_tokens(self, state: int) -> Dict[int, int]:
        """token_id -> next DFA state, for every token walkable from
        state. Computed once per state and cached."""
        cached = self._token_index.get(state)
        if cached is not None:
            return cached
        out: Dict[int, int] = {}
        for tid, text in enumerate(self.vocab):
            if not text:
                continue
            nxt = self.step_token(state, text)
            if nxt is not None:
                out[tid] = nxt
        self._token_index[state] = out
        return out
