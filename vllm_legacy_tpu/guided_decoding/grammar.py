"""EBNF grammar -> regex (guided_grammar support).

Reference: ``vllm/model_executor/guided_decoding/outlines_decoding.py``
feeds Lark grammars to outlines' CFGFSM, which interleaves an
incremental parser with decoding. The TPU pipeline compiles constraints
to a token DFA ONCE (guided_decoding/__init__.py), so grammars are
handled by *regularization*: nonterminals are substituted inline with a
bounded recursion depth, producing a regex accepted by the in-tree
compiler. Non-recursive grammars convert exactly; recursive ones (e.g.
nested JSON) are approximated to ``max_depth`` nesting levels — the
same practical bound the JSON-schema builder applies.

Supported syntax (Lark + GBNF common subset):
  rule definitions    name: body   |   name ::= body   (? prefix ok)
  literals            "..."  '...'
  inline regex        /.../
  char classes        [a-z0-9]
  grouping            ( ... )
  alternation         |
  quantifiers         * + ? {m} {m,} {m,n}
  rule refs           lowercase rules / UPPERCASE terminals
  %import common.X    (built-in terminals below)
  %ignore TERM        optional TERM between rule atoms (lark-like)

Start symbol: ``start`` or ``root``, else the first rule.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_COMMON_TERMINALS = {
    "INT": r"[0-9]+",
    "SIGNED_INT": r"[+-]?[0-9]+",
    "NUMBER": r"[0-9]+(\.[0-9]+)?",
    "SIGNED_NUMBER": r"[+-]?[0-9]+(\.[0-9]+)?",
    "FLOAT": r"[0-9]+\.[0-9]+",
    "WORD": r"[A-Za-z]+",
    "CNAME": r"[A-Za-z_][A-Za-z0-9_]*",
    "LETTER": r"[A-Za-z]",
    "DIGIT": r"[0-9]",
    "WS": r"[ \t\r\n]+",
    "WS_INLINE": r"[ \t]+",
    "ESCAPED_STRING": r'"([^"\\]|\\.)*"',
    "NEWLINE": r"\r?\n",
}

_TOKEN_RE = re.compile(
    r"""
      (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<regex>/(?:[^/\\]|\\.)+/)
    | (?P<cls>\[(?:[^\]\\]|\\.)+\])
    | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<rep>\{[0-9]+(?:,[0-9]*)?\})
    | (?P<op>[()|*+?])
    """, re.VERBOSE)


class GrammarError(ValueError):
    pass


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$/#&~" or ch in "\n\r\t":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return body.encode().decode("unicode_escape")


def _split_rules(grammar: str) -> Tuple[Dict[str, str], Optional[str],
                                        List[str]]:
    """-> (rules, start_name, ignored_terminals)."""
    rules: Dict[str, str] = {}
    order: List[str] = []
    ignores: List[str] = []
    # strip comments (// and # to EOL, outside strings — simple pass)
    lines = []
    for raw in grammar.splitlines():
        s = raw
        for marker in ("//", "#"):
            idx = _find_outside_strings(s, marker)
            if idx >= 0:
                s = s[:idx]
        lines.append(s)
    # join continuation lines: a new rule starts at col 0 with name[:|::=]
    rule_re = re.compile(
        r"^\s*\??([A-Za-z_][A-Za-z0-9_]*)\s*(::=|:)\s*(.*)$")
    current: Optional[str] = None
    for line in lines:
        if not line.strip():
            continue
        if line.strip().startswith("%"):
            parts = line.strip().split()
            if parts[0] == "%ignore" and len(parts) > 1:
                ignores.append(parts[1])
            continue  # %import handled via _COMMON_TERMINALS
        m = rule_re.match(line)
        if m and not _looks_like_continuation(line):
            name, _, body = m.groups()
            rules[name] = body.strip()
            order.append(name)
            current = name
        elif current is not None:
            rules[current] += " " + line.strip()
        else:
            raise GrammarError(f"cannot parse grammar line: {line!r}")
    if not rules:
        raise GrammarError("grammar defines no rules")
    start = ("start" if "start" in rules else
             "root" if "root" in rules else order[0])
    return rules, start, ignores


def _find_outside_strings(s: str, marker: str) -> int:
    in_q: Optional[str] = None
    i = 0
    while i < len(s):
        c = s[i]
        if in_q:
            if c == "\\":
                i += 2
                continue
            if (c == in_q or (in_q == "/" and c == "/")
                    or (in_q == "[" and c == "]")):
                in_q = None
        elif c in "\"'/[":  # strings, regexes, char classes
            in_q = c
        elif s.startswith(marker, i):
            return i
        i += 1
    return -1


def _looks_like_continuation(line: str) -> bool:
    # a line like `  | "x"` continues the previous rule even though the
    # rule_re could not match it anyway; only indented x: y is ambiguous
    return line[:1].isspace() and line.lstrip().startswith("|")


class _Converter:

    # user-supplied grammars are a request input: bound the regularized
    # pattern so recursive grammars fail fast instead of expanding into
    # multi-megabyte regexes (remote-DoS guard)
    MAX_PATTERN_CHARS = 256_000

    def __init__(self, rules: Dict[str, str], ignores: List[str],
                 max_depth: int):
        self.rules = rules
        self.max_depth = max_depth
        self._emitted = 0
        # memo: identical (rule, active-recursion profile) conversions
        # repeat heavily for common terminals (NUMBER, WS, ...)
        self._memo: Dict[tuple, str] = {}
        # ignore terminals convert with self.ignores still empty (no
        # separator interleaving inside the separators themselves)
        self.ignores: List[str] = []
        self.ignores = [self._terminal_pattern(t) for t in ignores]

    def _terminal_pattern(self, name: str) -> str:
        if name in self.rules:
            return self.convert(name, (), top_terminal=True)
        if name in _COMMON_TERMINALS:
            return _COMMON_TERMINALS[name]
        raise GrammarError(f"%ignore references unknown rule {name}")

    def convert(self, name: str, stack: tuple,
                top_terminal: bool = False) -> str:
        body = self.rules.get(name)
        if body is None:
            short = name.split(".")[-1]
            if short in _COMMON_TERMINALS:
                return _COMMON_TERMINALS[short]
            raise GrammarError(f"undefined rule {name!r}")
        if stack.count(name) >= self.max_depth:
            # recursion cutoff: the enclosing alternation drops this
            # branch (regular approximation to max_depth nesting)
            raise _DepthExceeded(name)
        is_terminal = name.isupper() or top_terminal
        # memo key: the rule plus the counts of every rule active on
        # the stack (those determine where inner cutoffs land)
        counts = tuple(sorted(
            (r, stack.count(r)) for r in set(stack)))
        key = (name, is_terminal, counts)
        if key in self._memo:
            out = self._memo[key]
            self._bump(len(out))
            return out
        out = self._convert_body(body, stack + (name, ), is_terminal)
        self._memo[key] = out
        return out

    def _bump(self, n: int) -> None:
        self._emitted += n
        if self._emitted > self.MAX_PATTERN_CHARS:
            raise GrammarError(
                "grammar expands beyond the supported pattern size "
                f"({self.MAX_PATTERN_CHARS} chars) — reduce recursion "
                "depth or simplify the grammar")

    def _convert_body(self, body: str, stack: tuple,
                      is_terminal: bool) -> str:
        """Top-level alternation with recursive-branch pruning."""
        alts = _split_alternatives(body)
        converted: List[str] = []
        last_err: Optional[_DepthExceeded] = None
        for alt in alts:
            try:
                converted.append(
                    self._convert_seq(alt, stack, is_terminal))
            except _DepthExceeded as e:
                last_err = e  # prune this branch at the cutoff
        if not converted:
            raise last_err or GrammarError("empty grammar body")
        if len(converted) == 1:
            return converted[0]
        return "|".join(converted)

    def _convert_seq(self, body: str, stack: tuple,
                     is_terminal: bool) -> str:
        out: List[str] = []
        atoms = 0
        pos = 0
        sep = ""
        if self.ignores and not is_terminal:
            sep = "(?:" + "|".join(self.ignores) + ")*"

        def emit(atom: str):
            nonlocal atoms
            # the separator rides INSIDE the atom group so quantified
            # atoms allow ignored tokens on every repetition (lark
            # semantics: ignored terminals may appear anywhere)
            if sep:
                atom = "(?:" + sep + atom + ")"
            self._bump(len(atom))
            out.append(atom)
            atoms += 1

        while pos < len(body):
            if body[pos].isspace():
                pos += 1
                continue
            m = _TOKEN_RE.match(body, pos)
            if not m:
                raise GrammarError(
                    f"cannot tokenize grammar at: {body[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup
            tok = m.group()
            if kind == "string":
                emit("(?:" + _escape_literal(_unquote(tok)) + ")")
            elif kind == "regex":
                emit("(?:" + tok[1:-1] + ")")
            elif kind == "cls":
                emit(tok)
            elif kind == "name":
                emit("(?:" + self.convert(tok, stack) + ")")
            elif kind == "rep" or tok in "*+?":
                if not out:
                    raise GrammarError("quantifier with no atom")
                out[-1] = out[-1] + tok
            elif tok == "(":
                depth_p = 1
                j = pos
                while j < len(body) and depth_p:
                    mm = _TOKEN_RE.match(body, j)
                    if mm:
                        t = mm.group()
                        if t == "(":
                            depth_p += 1
                        elif t == ")":
                            depth_p -= 1
                        j = mm.end()
                    else:
                        j += 1
                if depth_p:
                    raise GrammarError("unbalanced parentheses")
                inner = body[pos:j - 1]
                emit("(?:" +
                     self._convert_body(inner, stack, is_terminal) +
                     ")")
                pos = j
            elif tok == ")":
                raise GrammarError("unbalanced parentheses")
            else:
                raise GrammarError(f"unexpected token {tok!r}")
        return "".join(out)


class _DepthExceeded(GrammarError):

    def __init__(self, rule: str):
        super().__init__(
            f"rule {rule!r} recurses deeper than max_depth on every "
            "alternative; cannot approximate as a regular language")


def _split_alternatives(body: str) -> List[str]:
    """Split on top-level | (outside (), strings, classes, regexes)."""
    alts: List[str] = []
    depth = 0
    cur = []
    pos = 0
    while pos < len(body):
        if body[pos].isspace():
            cur.append(body[pos])
            pos += 1
            continue
        m = _TOKEN_RE.match(body, pos)
        if not m:
            raise GrammarError(
                f"cannot tokenize grammar at: {body[pos:pos+20]!r}")
        tok = m.group()
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        if tok == "|" and depth == 0:
            alts.append("".join(cur))
            cur = []
        else:
            cur.append(body[pos:m.end()])
        pos = m.end()
    alts.append("".join(cur))
    return alts


def grammar_to_regex(grammar: str, *, max_depth: int = 8) -> str:
    """Convert an EBNF grammar to an equivalent (or depth-bounded)
    regex for the in-tree compiler.

    Recursive grammars whose expansion exceeds the size budget retry at
    decreasing depth (the nesting bound degrades gracefully instead of
    rejecting the request)."""
    rules, start, ignores = _split_rules(grammar)
    last: Optional[GrammarError] = None
    for depth in range(max_depth, 1, -1):
        conv = _Converter(rules, ignores, depth)
        try:
            pattern = conv.convert(start, ())
        except _DepthExceeded:
            raise  # no alternative escapes recursion at any depth
        except GrammarError as e:
            if "pattern size" in str(e):
                last = e  # shallower retry
                continue
            raise
        if conv.ignores:
            ws = "(?:" + "|".join(conv.ignores) + ")*"
            pattern = ws + "(?:" + pattern + ")" + ws
        return pattern
    raise last or GrammarError("grammar too complex")
