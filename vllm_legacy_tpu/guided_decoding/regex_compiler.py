"""Regex -> DFA compiler over codepoint intervals.

From-scratch replacement for the ``interegular``/``outlines`` FSM stack the
reference relies on (vllm/model_executor/guided_decoding/
outlines_logits_processors.py builds its masks from an interegular FSM).
Supports the practical regex subset emitted by the JSON-schema builder and
typical user patterns: literals, escapes (\\d \\w \\s \\D \\W \\S and
single-char escapes), ``.``, character classes ``[a-z^-]``, groups,
alternation, and quantifiers ``* + ? {m} {m,} {m,n}``.

The alphabet is partitioned into codepoint intervals, so the DFA transition
table is [num_states, num_classes] regardless of the (Unicode-sized)
alphabet. Anchors are implicit: the whole string must match (fullmatch
semantics, as in outlines).
"""
from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

import numpy as np

MAX_CP = 0x10FFFF
_MAX_DFA_STATES = 50_000

Interval = Tuple[int, int]  # inclusive codepoint range


# ---------------------------------------------------------------------------
# interval-set helpers
# ---------------------------------------------------------------------------
def _normalize(ivs: Sequence[Interval]) -> Tuple[Interval, ...]:
    ivs = sorted((lo, hi) for lo, hi in ivs if lo <= hi)
    out: List[Interval] = []
    for lo, hi in ivs:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def _negate(ivs: Sequence[Interval]) -> Tuple[Interval, ...]:
    ivs = _normalize(ivs)
    out: List[Interval] = []
    prev = 0
    for lo, hi in ivs:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return tuple(out)


_D = _normalize([(ord("0"), ord("9"))])
_W = _normalize([(ord("a"), ord("z")), (ord("A"), ord("Z")),
                 (ord("0"), ord("9")), (ord("_"), ord("_"))])
_S = _normalize([(9, 13), (32, 32), (0x85, 0x85), (0xA0, 0xA0)])
_DOT = _negate([(10, 10)])  # . = anything but newline


# ---------------------------------------------------------------------------
# parser -> AST
# ---------------------------------------------------------------------------
class _Node:
    __slots__ = ("kind", "ivs", "kids", "lo", "hi")

    def __init__(self, kind, ivs=None, kids=None, lo=0, hi=0):
        self.kind = kind  # lit | cat | alt | star | opt | eps
        self.ivs = ivs
        self.kids = kids or []
        self.lo = lo
        self.hi = hi


def _eps() -> _Node:
    return _Node("eps")


def _lit(ivs) -> _Node:
    return _Node("lit", ivs=_normalize(ivs))


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def error(self, msg: str):
        raise ValueError(f"regex parse error at {self.i}: {msg} "
                         f"(pattern={self.p!r})")

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self) -> _Node:
        node = self._alt()
        if self.i != len(self.p):
            self.error("unexpected trailing characters")
        return node

    def _alt(self) -> _Node:
        branches = [self._cat()]
        while self.peek() == "|":
            self.next()
            branches.append(self._cat())
        if len(branches) == 1:
            return branches[0]
        return _Node("alt", kids=branches)

    def _cat(self) -> _Node:
        items: List[_Node] = []
        while self.peek() is not None and self.peek() not in "|)":
            items.append(self._quantified())
        if not items:
            return _eps()
        if len(items) == 1:
            return items[0]
        return _Node("cat", kids=items)

    def _quantified(self) -> _Node:
        atom = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.next()
                atom = _Node("star", kids=[atom])
            elif ch == "+":
                self.next()
                atom = _Node("cat",
                             kids=[atom, _Node("star", kids=[atom])])
            elif ch == "?":
                self.next()
                atom = _Node("opt", kids=[atom])
            elif ch == "{":
                save = self.i
                rep = self._try_repeat(atom)
                if rep is None:
                    self.i = save
                    break
                atom = rep
            else:
                break
        return atom

    def _try_repeat(self, atom: _Node) -> Optional[_Node]:
        assert self.next() == "{"
        m_str = ""
        while self.peek() is not None and self.peek().isdigit():
            m_str += self.next()
        ch = self.peek()
        if ch == "}" and m_str:
            self.next()
            return self._expand(atom, int(m_str), int(m_str))
        if ch != "," or not m_str:
            return None  # literal '{'
        self.next()
        n_str = ""
        while self.peek() is not None and self.peek().isdigit():
            n_str += self.next()
        if self.peek() != "}":
            return None
        self.next()
        m = int(m_str)
        if n_str:
            n = int(n_str)
            if n < m:
                self.error(f"bad repeat {{{m},{n}}}")
            return self._expand(atom, m, n)
        return _Node("cat",
                     kids=[self._expand(atom, m, m),
                           _Node("star", kids=[atom])])

    @staticmethod
    def _expand(atom: _Node, m: int, n: int) -> _Node:
        kids = [atom] * m + [_Node("opt", kids=[atom])] * (n - m)
        if not kids:
            return _eps()
        if len(kids) == 1:
            return kids[0]
        return _Node("cat", kids=kids)

    def _atom(self) -> _Node:
        ch = self.next()
        if ch == "(":
            # (?:...) and (...) are equivalent (no capture semantics)
            if self.peek() == "?":
                self.next()
                nxt = self.peek()
                if nxt in (":", ):
                    self.next()
                else:
                    self.error(f"unsupported group modifier (?{nxt}")
            node = self._alt()
            if self.peek() != ")":
                self.error("unclosed group")
            self.next()
            return node
        if ch == "[":
            return self._char_class()
        if ch == "\\":
            return _lit(self._escape())
        if ch == ".":
            return _lit(_DOT)
        if ch in "^$":
            return _eps()  # fullmatch semantics: anchors are no-ops
        if ch in "*+?":
            self.error(f"dangling quantifier {ch!r}")
        return _lit([(ord(ch), ord(ch))])

    def _escape(self) -> Tuple[Interval, ...]:
        if self.peek() is None:
            self.error("trailing backslash")
        ch = self.next()
        table = {"d": _D, "w": _W, "s": _S}
        if ch in table:
            return table[ch]
        if ch.upper() in table and ch.isupper():
            return _negate(table[ch.lower()])
        simple = {"n": 10, "t": 9, "r": 13, "f": 12, "v": 11, "0": 0,
                  "a": 7, "b": 8}
        if ch in simple:
            return ((simple[ch], simple[ch]), )
        if ch in ("x", "u"):
            width = 2 if ch == "x" else 4
            if self.peek() == "{":
                self.next()
                hexs = ""
                while self.peek() not in ("}", None):
                    hexs += self.next()
                if self.peek() != "}":
                    self.error("unclosed \\x{...}")
                self.next()
            else:
                hexs = "".join(self.next() for _ in range(width))
            cp = int(hexs, 16)
            return ((cp, cp), )
        return ((ord(ch), ord(ch)), )

    def _char_class(self) -> _Node:
        negated = False
        if self.peek() == "^":
            self.next()
            negated = True
        ivs: List[Interval] = []
        first = True
        while True:
            ch = self.peek()
            if ch is None:
                self.error("unclosed character class")
            if ch == "]" and not first:
                self.next()
                break
            first = False
            if ch == "\\":
                self.next()
                sub = self._escape()
                if len(sub) == 1 and sub[0][0] == sub[0][1]:
                    lo = sub[0][0]
                else:
                    ivs.extend(sub)
                    continue
            else:
                lo = ord(self.next())
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.next()
                if self.peek() == "\\":
                    self.next()
                    sub = self._escape()
                    if len(sub) != 1 or sub[0][0] != sub[0][1]:
                        self.error("bad range endpoint")
                    hi = sub[0][0]
                else:
                    hi = ord(self.next())
                ivs.append((lo, hi))
            else:
                ivs.append((lo, lo))
        ivs_t = _normalize(ivs)
        if negated:
            ivs_t = _negate(ivs_t)
        return _lit(ivs_t)


# ---------------------------------------------------------------------------
# NFA (Thompson) -> DFA (subset construction over interval classes)
# ---------------------------------------------------------------------------
class DFA:
    """``char_table[state, cls]`` -> next state (-1 dead). Codepoint ->
    class via ``class_of`` (searchsorted on segment starts)."""

    def __init__(self, char_table: np.ndarray, seg_starts: np.ndarray,
                 seg_class: np.ndarray, accepts: np.ndarray):
        self.char_table = char_table  # [S, C] int32
        self.seg_starts = seg_starts  # [G] int32, sorted segment starts
        self.seg_class = seg_class  # [G] int32 class id or -1
        self.accepts = accepts  # [S] bool
        self.num_states = char_table.shape[0]

    def class_of(self, cps: np.ndarray) -> np.ndarray:
        """Map codepoints (int array) to class ids (-1 = no class)."""
        idx = np.searchsorted(self.seg_starts, cps, side="right") - 1
        cls = self.seg_class[np.clip(idx, 0, len(self.seg_class) - 1)]
        return np.where(idx < 0, -1, cls)  # below the first boundary

    def step(self, state: int, cp: int) -> int:
        if state < 0:
            return -1
        cls = int(self.class_of(np.asarray([cp]))[0])
        if cls < 0:
            return -1
        return int(self.char_table[state, cls])

    def match_prefix(self, s: str) -> int:
        """Walk string from the initial state; -1 if it leaves the DFA."""
        state = 0
        for ch in s:
            state = self.step(state, ord(ch))
            if state < 0:
                return -1
        return state


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()

    # --- Thompson construction ---
    eps_edges: List[List[int]] = []
    char_edges: List[List[Tuple[Tuple[Interval, ...], int]]] = []

    def new_state() -> int:
        eps_edges.append([])
        char_edges.append([])
        return len(eps_edges) - 1

    def build(node: _Node) -> Tuple[int, int]:
        s, t = new_state(), new_state()
        if node.kind == "eps":
            eps_edges[s].append(t)
        elif node.kind == "lit":
            char_edges[s].append((node.ivs, t))
        elif node.kind == "cat":
            prev = s
            for kid in node.kids:
                ks, kt = build(kid)
                eps_edges[prev].append(ks)
                prev = kt
            eps_edges[prev].append(t)
        elif node.kind == "alt":
            for kid in node.kids:
                ks, kt = build(kid)
                eps_edges[s].append(ks)
                eps_edges[kt].append(t)
        elif node.kind == "star":
            ks, kt = build(node.kids[0])
            eps_edges[s].extend((ks, t))
            eps_edges[kt].extend((ks, t))
        elif node.kind == "opt":
            ks, kt = build(node.kids[0])
            eps_edges[s].extend((ks, t))
            eps_edges[kt].append(t)
        else:
            raise AssertionError(node.kind)
        return s, t

    start, final = build(ast)

    # --- alphabet partition ---
    bounds = set()
    for edges in char_edges:
        for ivs, _ in edges:
            for lo, hi in ivs:
                bounds.add(lo)
                bounds.add(hi + 1)
    seg_starts = sorted(bounds) or [0]
    seg_of: Dict[int, int] = {b: i for i, b in enumerate(seg_starts)}
    # class id per segment: only segments covered by some interval get one
    covered = [False] * len(seg_starts)
    for edges in char_edges:
        for ivs, _ in edges:
            for lo, hi in ivs:
                i = seg_of[lo]
                while i < len(seg_starts) and seg_starts[i] <= hi:
                    covered[i] = True
                    i += 1
    seg_class_l: List[int] = []
    num_classes = 0
    for c in covered:
        if c:
            seg_class_l.append(num_classes)
            num_classes += 1
        else:
            seg_class_l.append(-1)

    # per NFA edge: the set of class ids it covers
    def classes_of(ivs: Tuple[Interval, ...]) -> List[int]:
        out = []
        for lo, hi in ivs:
            i = seg_of[lo]
            while i < len(seg_starts) and seg_starts[i] <= hi:
                if seg_class_l[i] >= 0:
                    out.append(seg_class_l[i])
                i += 1
        return out

    edge_classes: List[List[Tuple[List[int], int]]] = [[
        (classes_of(ivs), dst) for ivs, dst in edges
    ] for edges in char_edges]

    # --- eps closures ---
    def closure(states: FrozenSet[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in eps_edges[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    # --- subset construction ---
    init = closure(frozenset([start]))
    dfa_ids: Dict[FrozenSet[int], int] = {init: 0}
    worklist = [init]
    table_rows: List[np.ndarray] = []
    accepts_l: List[bool] = []
    while worklist:
        cur = worklist.pop()
        cur_id = dfa_ids[cur]
        while len(table_rows) <= cur_id:
            table_rows.append(None)  # type: ignore[arg-type]
            accepts_l.append(False)
        row = np.full((num_classes, ), -1, np.int32)
        move: Dict[int, set] = {}
        for s in cur:
            for cls_list, dst in edge_classes[s]:
                for c in cls_list:
                    move.setdefault(c, set()).add(dst)
        for c, dsts in move.items():
            nxt = closure(frozenset(dsts))
            if nxt not in dfa_ids:
                if len(dfa_ids) >= _MAX_DFA_STATES:
                    raise ValueError(
                        f"regex DFA exceeds {_MAX_DFA_STATES} states: "
                        f"{pattern[:80]!r}")
                dfa_ids[nxt] = len(dfa_ids)
                worklist.append(nxt)
            row[c] = dfa_ids[nxt]
        table_rows[cur_id] = row
        accepts_l[cur_id] = final in cur

    char_table = np.stack(table_rows).astype(np.int32)
    return DFA(char_table,
               np.asarray(seg_starts, np.int64),
               np.asarray(seg_class_l, np.int32),
               np.asarray(accepts_l, np.bool_))
