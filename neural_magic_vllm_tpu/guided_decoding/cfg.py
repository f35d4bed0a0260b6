"""Context-free-grammar guided decoding (reference CFGLogitsProcessor,
vllm/model_executor/guided_decoding/outlines_logits_processors.py:126).

Self-contained: a small EBNF-style grammar language compiled to
character-level productions, an incremental Earley recognizer, and a
vocab-trie walk that computes the per-step allowed-token mask. The
reference delegates to outlines+lark; this environment has neither, and
the masking runs on the host next to the sampler exactly like the
regex/JSON FSM backend (guided_decoding/__init__.py), so nothing here
touches the TPU path.

Grammar syntax (one rule per line, first rule is the start symbol):
    expr: term | expr "+" term
    term: NUMBER | "(" expr ")"
    NUMBER: [0-9]+
Items: rule names, "quoted literals", [char-classes] (ranges + negation),
postfix ? * + repetition, and ( ) grouping. Whitespace between items is
NOT implicit — encode it in the grammar.
"""
import math
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

import numpy as np

# An item in a production body: ("lit", str) one exact char,
# ("class", frozenset, negated) one char from a set, or ("nt", name).
Item = Tuple


class GrammarError(ValueError):
    pass


class _GrammarParser:
    """Parses the EBNF text into char-level productions, desugaring
    literals (char sequences), groups and ? * + into auxiliary rules."""

    def __init__(self) -> None:
        self.rules: Dict[str, List[List[Item]]] = {}
        self._aux = 0

    def parse(self, text: str) -> Tuple[str, Dict[str, List[List[Item]]]]:
        start = None
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("//") or line.startswith("#"):
                continue
            if ":" not in line:
                raise GrammarError(f"rule line missing ':': {line!r}")
            name, body = line.split(":", 1)
            name = name.strip()
            if not name.isidentifier():
                raise GrammarError(f"bad rule name {name!r}")
            if start is None:
                start = name
            alts = self.rules.setdefault(name, [])
            for alt in self._split_alts(body):
                alts.append(self._parse_seq(alt))
        if start is None:
            raise GrammarError("empty grammar")
        # validate nonterminal references
        for name, alts in self.rules.items():
            for alt in alts:
                for it in alt:
                    if it[0] == "nt" and it[1] not in self.rules:
                        raise GrammarError(
                            f"rule {name!r} references undefined "
                            f"{it[1]!r}")
        return start, self.rules

    def _split_alts(self, body: str) -> List[str]:
        alts, depth, in_str, in_cls, cur = [], 0, False, False, []
        i = 0
        while i < len(body):
            c = body[i]
            if in_str:
                cur.append(c)
                if c == "\\" and i + 1 < len(body):
                    cur.append(body[i + 1])
                    i += 1
                elif c == '"':
                    in_str = False
            elif in_cls:
                cur.append(c)
                if c == "\\" and i + 1 < len(body):
                    cur.append(body[i + 1])
                    i += 1
                elif c == "]":
                    in_cls = False
            elif c == '"':
                in_str = True
                cur.append(c)
            elif c == "[":
                in_cls = True
                cur.append(c)
            elif c == "(":
                depth += 1
                cur.append(c)
            elif c == ")":
                depth -= 1
                cur.append(c)
            elif c == "|" and depth == 0:
                alts.append("".join(cur))
                cur = []
            else:
                cur.append(c)
            i += 1
        alts.append("".join(cur))
        return alts

    def _aux_rule(self, alts: List[List[Item]]) -> str:
        self._aux += 1
        name = f"__aux{self._aux}"
        self.rules[name] = alts
        return name

    def _parse_seq(self, s: str) -> List[Item]:
        items: List[Item] = []
        i = 0
        n = len(s)
        while i < n:
            c = s[i]
            if c.isspace():
                i += 1
                continue
            if c == '"':
                j = i + 1
                chars = []
                while j < n and s[j] != '"':
                    if s[j] == "\\" and j + 1 < n:
                        chars.append(self._unescape(s[j + 1]))
                        j += 2
                    else:
                        chars.append(s[j])
                        j += 1
                if j >= n:
                    raise GrammarError(f"unterminated string in {s!r}")
                group = [("lit", ch) for ch in chars]
                i = j + 1
                i, item = self._postfix(s, i, group)
                items.extend(item)
            elif c == "[":
                j = i + 1
                neg = j < n and s[j] == "^"
                if neg:
                    j += 1
                chars: set = set()
                while j < n and s[j] != "]":
                    if s[j] == "\\" and j + 1 < n:
                        lo = self._unescape(s[j + 1])
                        j += 2
                    else:
                        lo = s[j]
                        j += 1
                    if j + 1 < n and s[j] == "-" and s[j + 1] != "]":
                        hi = s[j + 1]
                        chars.update(chr(o) for o in range(ord(lo),
                                                           ord(hi) + 1))
                        j += 2
                    else:
                        chars.add(lo)
                if j >= n:
                    raise GrammarError(f"unterminated class in {s!r}")
                group = [("class", frozenset(chars), neg)]
                i = j + 1
                i, item = self._postfix(s, i, group)
                items.extend(item)
            elif c == "(":
                depth, j = 1, i + 1
                in_str = in_cls = False
                while j < n and depth:
                    cj = s[j]
                    if in_str:
                        in_str = cj != '"'
                    elif in_cls:
                        in_cls = cj != "]"
                    elif cj == '"':
                        in_str = True
                    elif cj == "[":
                        in_cls = True
                    elif cj == "(":
                        depth += 1
                    elif cj == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise GrammarError(f"unbalanced parens in {s!r}")
                inner = s[i + 1:j - 1]
                aux = self._aux_rule(
                    [self._parse_seq(a) for a in self._split_alts(inner)])
                group = [("nt", aux)]
                i = j
                i, item = self._postfix(s, i, group)
                items.extend(item)
            elif c.isidentifier() or c == "_":
                j = i
                while j < n and (s[j].isalnum() or s[j] == "_"):
                    j += 1
                group = [("nt", s[i:j])]
                i = j
                i, item = self._postfix(s, i, group)
                items.extend(item)
            else:
                raise GrammarError(f"unexpected {c!r} in {s!r}")
        return items

    @staticmethod
    def _unescape(c: str) -> str:
        return {"n": "\n", "t": "\t", "r": "\r"}.get(c, c)

    def _postfix(self, s: str, i: int,
                 group: List[Item]) -> Tuple[int, List[Item]]:
        """Apply an optional trailing ? * + to the parsed group."""
        if i < len(s) and s[i] in "?*+":
            op = s[i]
            i += 1
            if op == "?":
                aux = self._aux_rule([group, []])
                return i, [("nt", aux)]
            if op == "*":
                self._aux += 1
                name = f"__aux{self._aux}"
                self.rules[name] = [group + [("nt", name)], []]
                return i, [("nt", name)]
            # +: one occurrence then star
            self._aux += 1
            name = f"__aux{self._aux}"
            self.rules[name] = [group + [("nt", name)], group]
            return i, [("nt", name)]
        return i, group


def _matches(item: Item, ch: str) -> bool:
    if item[0] == "lit":
        return ch == item[1]
    if item[0] == "class":
        return (ch in item[1]) != item[2]
    return False


class _Chart:
    """One Earley item set. `items` is the set of (name, body, dot,
    origin) tuples; `waiting` indexes items by the nonterminal under
    their dot so completion is O(parents) instead of O(chart)."""

    __slots__ = ("items", "waiting")

    def __init__(self) -> None:
        self.items: set = set()
        self.waiting: Dict[str, List[Tuple]] = {}


class CFGuide:
    """Incremental character-level Earley recognizer + vocab-trie masking.

    The chart is the standard Earley item set list; `advance` scans one
    character. `allowed_token_ids` walks the tokenizer trie, advancing a
    speculative chart along each edge and pruning dead branches. Two hot-
    path optimizations keep the per-decode-step cost tractable on real
    vocabularies: (a) closure runs a worklist with per-chart waiting
    indexes (not a whole-chart fixpoint rescan), and (b) the trie walk
    groups sibling edges into character-equivalence classes — all chars
    matched by the same scannable items share one successor chart, so a
    [^"\\]-style class inside a string costs ONE closure, not one per
    distinct byte."""

    def __init__(self, grammar: str,
                 vocab_strings: Sequence[Optional[str]]) -> None:
        self.start, self.rules = _GrammarParser().parse(grammar)
        # productions as (name, tuple(body)); Earley item =
        # (name, body, dot, origin)
        self._trie = _build_trie(vocab_strings)
        self.initial = self._closure_chart()

    # --- Earley core -------------------------------------------------------
    def _closure_chart(self):
        chart = _Chart()
        for body in self.rules[self.start]:
            chart.items.add((self.start, tuple(body), 0, 0))
        charts = [chart]
        self._close(charts, 0)
        return charts

    def _close(self, charts, k):
        """Predict + complete to fixpoint at position k (worklist)."""
        chart = charts[k]
        work = list(chart.items)
        completed_here: Dict[str, bool] = {}

        def add(item):
            if item not in chart.items:
                chart.items.add(item)
                work.append(item)

        while work:
            name, body, dot, origin = item = work.pop()
            if dot < len(body) and body[dot][0] == "nt":
                nt = body[dot][1]
                chart.waiting.setdefault(nt, []).append(item)
                for alt in self.rules[nt]:
                    add((nt, tuple(alt), 0, k))
                # nullable: nt may already be completed at k with
                # origin k — advance past it immediately
                if completed_here.get(nt):
                    add((name, body, dot + 1, origin))
            elif dot == len(body):  # complete
                if origin == k:
                    completed_here[name] = True
                for parent in charts[origin].waiting.get(name, ()):
                    pn, pb, pd, po = parent
                    add((pn, pb, pd + 1, po))

    def advance(self, charts, ch: str):
        """Scan `ch`; returns new charts or None if not a valid prefix."""
        seed = set()
        for name, body, dot, origin in charts[-1].items:
            if dot < len(body) and _matches(body[dot], ch):
                seed.add((name, body, dot + 1, origin))
        if not seed:
            return None
        return self._extend(charts, seed)

    def _extend(self, charts, seed):
        chart = _Chart()
        chart.items.update(seed)
        charts = charts + [chart]
        self._close(charts, len(charts) - 1)
        return charts

    def accepts(self, charts) -> bool:
        return any(name == self.start and dot == len(body) and origin == 0
                   for name, body, dot, origin in charts[-1].items)

    # --- token masking -----------------------------------------------------
    def allowed_token_ids(self, charts) -> List[int]:
        allowed: List[int] = []
        stack = [(self._trie, charts)]
        while stack:
            node, ch_charts = stack.pop()
            # scannable items of the current chart, fixed order so the
            # per-char match signature is a stable bitmask
            scan = [it for it in ch_charts[-1].items
                    if it[2] < len(it[1]) and it[1][it[2]][0] != "nt"]
            cache: Dict[int, Optional[list]] = {}
            for ch, (child, token_ids) in node.items():
                sig = 0
                for i, it in enumerate(scan):
                    if _matches(it[1][it[2]], ch):
                        sig |= 1 << i
                if not sig:
                    continue
                nxt = cache.get(sig)
                if nxt is None:
                    seed = {(it[0], it[1], it[2] + 1, it[3])
                            for i, it in enumerate(scan) if sig >> i & 1}
                    nxt = self._extend(ch_charts, seed)
                    cache[sig] = nxt
                allowed.extend(token_ids)
                stack.append((child, nxt))
        return allowed


def _build_trie(vocab_strings: Sequence[Optional[str]]):
    """char -> (child_node, [token ids ending here]) nested dicts."""
    root: Dict = {}
    for tid, text in enumerate(vocab_strings):
        if not text:
            continue
        node = root
        for i, ch in enumerate(text):
            child = node.get(ch)
            if child is None:
                child = ({}, [])
                node[ch] = child
            if i == len(text) - 1:
                child[1].append(tid)
            node = child[0]
    return root


class CFGLogitsProcessor:
    """Stateful per-request processor (same contract as
    FSMLogitsProcessor): (generated_ids, logits) -> masked logits."""

    def __init__(self, guide: CFGuide, vocab_strings,
                 eos_token_id: Optional[int]) -> None:
        self.guide = guide
        self.vocab_strings = vocab_strings
        self.eos_token_id = eos_token_id
        # Earley state keyed by generated-token prefix, NOT a single
        # cursor: the instance is shared via SamplingParams across all
        # sibling sequences of an n>1/best_of>1 request, whose outputs
        # diverge after the fork.
        self._states = {(): (guide.initial, False)}

    def _state_for(self, ids: List[int]):
        key = tuple(ids)
        if key in self._states:
            return self._states[key]
        i = len(ids)
        while i > 0 and tuple(ids[:i]) not in self._states:
            i -= 1
        charts, dead = self._states[tuple(ids[:i])]
        for tid in ids[i:]:
            if not dead and tid != self.eos_token_id:
                text = self.vocab_strings[tid] if tid < len(
                    self.vocab_strings) else None
                for ch in text or "":
                    nxt = self.guide.advance(charts, ch)
                    if nxt is None:
                        dead = True
                        break
                    charts = nxt
            i += 1
            self._states[tuple(ids[:i])] = (charts, dead)
        return charts, dead

    def __call__(self, generated_ids: List[int],
                 logits: np.ndarray) -> np.ndarray:
        self._charts, self._dead = self._state_for(generated_ids)

        mask = np.full_like(logits, -math.inf)
        if not self._dead:
            idx = np.asarray(self.guide.allowed_token_ids(self._charts),
                             dtype=np.int64)
            if idx.size:
                mask[idx] = logits[idx]
            if self.eos_token_id is not None and \
                    self.guide.accepts(self._charts):
                mask[self.eos_token_id] = logits[self.eos_token_id]
        elif self.eos_token_id is not None:
            mask[self.eos_token_id] = logits[self.eos_token_id]
        return mask
