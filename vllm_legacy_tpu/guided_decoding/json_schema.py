"""JSON Schema -> regex, for schema-guided generation.

From-scratch equivalent of outlines' ``build_regex_from_schema`` (the
reference calls it via vllm/model_executor/guided_decoding/
outlines_decoding.py). Regular languages can't express unbounded JSON
nesting, so free-form nesting (empty schema / additionalProperties /
untyped items) is expanded to a bounded depth — explicitly declared
schemas nest as deep as the declaration does.
"""
from __future__ import annotations

import json
import re
from typing import Any, Dict, List

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

_WS = r"[ \n\t\r]{0,8}"
_STRING_CHAR = r'([^"\\\x00-\x1f]|\\(["\\/bfnrt]|u[0-9a-fA-F]{4}))'
_STRING = f'"{_STRING_CHAR}*"'
_INTEGER = r"(-)?(0|[1-9][0-9]*)"
_NUMBER = r"(-)?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"
_BOOLEAN = r"(true|false)"
_NULL = r"null"

_FORMAT_REGEXES = {
    "uuid": r'"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}'
            r'-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"',
    "date": r'"[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"',
    "time": r'"([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?'
            r'(Z|[+-][0-2][0-9]:[0-5][0-9])?"',
    "date-time": r'"[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])'
                 r'T([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?'
                 r'(Z|[+-][0-2][0-9]:[0-5][0-9])?"',
}

_DEFAULT_ANY_DEPTH = 4
_MAX_OPTIONAL_PROPS = 8


def _escape_json_literal(value: Any) -> str:
    """Regex matching exactly the canonical JSON encoding of ``value``."""
    return re.escape(json.dumps(value, ensure_ascii=False))


def _any_value(depth: int, ws: str = _WS) -> str:
    prim = f"({_STRING}|{_NUMBER}|{_BOOLEAN}|{_NULL})"
    if depth <= 0:
        return prim
    inner = _any_value(depth - 1, ws)
    # star quantifiers (not bounded repeats): bounded repeats copy the
    # inner NFA per repetition, which explodes for the recursive case.
    arr = (rf"\[{ws}({inner}({ws},{ws}{inner})*)?{ws}\]")
    kv = f"{_STRING}{ws}:{ws}{inner}"
    obj = rf"\{{{ws}({kv}({ws},{ws}{kv})*)?{ws}\}}"
    return f"({prim}|{arr}|{obj})"


class _Builder:
    def __init__(self, root: Dict[str, Any], any_depth: int,
                 ws: str = _WS, any_order: bool = False):
        self.root = root
        self.any_depth = any_depth
        self.ws = ws
        # lm-format-enforcer semantics: object keys may appear in any
        # order (outlines pins schema declaration order)
        self.any_order = any_order

    def _resolve_ref(self, ref: str) -> Dict[str, Any]:
        if not ref.startswith("#/"):
            raise ValueError(f"only local $refs are supported: {ref}")
        node: Any = self.root
        for part in ref[2:].split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            node = node[part]
        return node

    def build(self, schema: Dict[str, Any], depth: int) -> str:
        if depth < 0:
            raise ValueError(
                "schema recursion exceeds the supported depth "
                f"({self.any_depth}); regular-language guided decoding "
                "cannot express unbounded recursion")
        if not isinstance(schema, dict):
            raise ValueError(f"invalid schema node: {schema!r}")
        if "$ref" in schema:
            return self.build(self._resolve_ref(schema["$ref"]), depth - 1)
        if "const" in schema:
            return _escape_json_literal(schema["const"])
        if "enum" in schema:
            return ("(" + "|".join(
                _escape_json_literal(v) for v in schema["enum"]) + ")")
        for key in ("anyOf", "oneOf"):
            if key in schema:
                return ("(" + "|".join(
                    self.build(s, depth) for s in schema[key]) + ")")
        if "allOf" in schema:
            if len(schema["allOf"]) != 1:
                raise ValueError("allOf with >1 subschema is unsupported")
            return self.build(schema["allOf"][0], depth)

        stype = schema.get("type")
        if isinstance(stype, list):
            return ("(" + "|".join(
                self.build({**schema, "type": t}, depth)
                for t in stype) + ")")
        if stype is None:
            if "properties" in schema or "additionalProperties" in schema:
                stype = "object"
            elif "items" in schema:
                stype = "array"
            else:
                return _any_value(min(depth, self.any_depth))

        if stype == "string":
            return self._string(schema)
        if stype == "integer":
            return _INTEGER
        if stype == "number":
            return _NUMBER
        if stype == "boolean":
            return _BOOLEAN
        if stype == "null":
            return _NULL
        if stype == "array":
            return self._array(schema, depth)
        if stype == "object":
            return self._object(schema, depth)
        raise ValueError(f"unsupported schema type: {stype!r}")

    def _string(self, schema: Dict[str, Any]) -> str:
        if "pattern" in schema:
            pat = schema["pattern"]
            pat = pat.lstrip("^").rstrip("$")
            return f'"({pat})"'
        fmt = schema.get("format")
        if fmt:
            if fmt not in _FORMAT_REGEXES:
                raise ValueError(f"unsupported string format: {fmt!r}")
            return _FORMAT_REGEXES[fmt]
        lo = schema.get("minLength")
        hi = schema.get("maxLength")
        if lo is None and hi is None:
            return _STRING
        lo = lo or 0
        quant = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
        return f'"{_STRING_CHAR}{quant}"'

    def _array(self, schema: Dict[str, Any], depth: int) -> str:
        items = schema.get("items")
        if items:
            item = self.build(items, depth - 1)
        else:
            item = _any_value(min(depth - 1, self.any_depth), self.ws)
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        ws = self.ws
        rest = f"({ws},{ws}{item})"
        if hi is None:
            tail = f"{rest}{{{max(lo - 1, 0)},}}"
        else:
            if hi < lo:
                raise ValueError("maxItems < minItems")
            if hi == 0:
                return rf"\[{ws}\]"
            tail = f"{rest}{{{max(lo - 1, 0)},{hi - 1}}}"
        body = f"{item}{tail}"
        if lo == 0:
            body = f"({body})?"
        return rf"\[{ws}{body}{ws}\]"

    # any-order objects (lm-format-enforcer semantics) enumerate key
    # permutations; cap the total property count so the DFA stays sane.
    _MAX_ANY_ORDER_PROPS = 5

    def _object(self, schema: Dict[str, Any], depth: int) -> str:
        ws = self.ws
        props: Dict[str, Any] = schema.get("properties", {})
        required = list(schema.get("required", []))
        if props:
            req = [k for k in props if k in required]
            opt = [k for k in props if k not in required]
            if len(opt) > _MAX_OPTIONAL_PROPS:
                raise ValueError(
                    f"more than {_MAX_OPTIONAL_PROPS} optional properties "
                    "are unsupported (subset enumeration)")

            def kv(key: str) -> str:
                return (f"{_escape_json_literal(key)}{ws}:{ws}"
                        f"{self.build(props[key], depth - 1)}")

            any_order = (self.any_order
                         and len(props) <= self._MAX_ANY_ORDER_PROPS)
            if self.any_order and not any_order:
                logger.warning(
                    "guided JSON: object has %d properties (> %d); "
                    "any-order key matching (lm-format-enforcer "
                    "semantics) degrades to declaration order for this "
                    "object — generations using other key orders will "
                    "be masked off.", len(props),
                    self._MAX_ANY_ORDER_PROPS)
            # every legal subset: required props plus any subset of
            # optional ones — in schema order, or (any_order) in every
            # permutation.
            alts: List[str] = []
            for bits in range(1 << len(opt)):
                keys = req + [o for i, o in enumerate(opt)
                              if bits & (1 << i)]
                keys = [k for k in props if k in keys]  # schema order
                if not keys:
                    continue
                if any_order:
                    from itertools import permutations
                    for order in permutations(keys):
                        alts.append((ws + "," + ws).join(
                            kv(k) for k in order))
                else:
                    alts.append((ws + "," + ws).join(kv(k) for k in keys))
            if not alts:
                return rf"\{{{ws}\}}"
            body = "(" + "|".join(alts) + ")"
            if not req:
                body += "?"
            return rf"\{{{ws}{body}{ws}\}}"

        addl = schema.get("additionalProperties")
        if addl in (None, True):
            val = _any_value(min(depth - 1, self.any_depth), ws)
        elif addl is False:
            return rf"\{{{ws}\}}"
        else:
            val = self.build(addl, depth - 1)
        kv_pat = f"{_STRING}{ws}:{ws}{val}"
        return rf"\{{{ws}({kv_pat}({ws},{ws}{kv_pat})*)?{ws}\}}"


def build_regex_from_schema(schema: Dict[str, Any],
                            any_depth: int = _DEFAULT_ANY_DEPTH,
                            whitespace_pattern: str = None,
                            any_order: bool = False) -> str:
    """JSON Schema (dict) -> full-match regex for its value language.

    ``whitespace_pattern`` overrides the inter-token whitespace regex
    (reference: outlines' whitespace_pattern / the request field
    guided_whitespace_pattern). ``any_order`` admits object keys in any
    order — the lm-format-enforcer behavioral difference
    (lm_format_enforcer_decoding.py:70)."""
    ws = _WS if whitespace_pattern is None else whitespace_pattern
    builder = _Builder(schema, any_depth, ws=ws, any_order=any_order)
    return builder.build(schema, depth=16)
