"""JSON schema -> regex (the reference delegates this to outlines'
build_regex_from_schema; same idea, self-contained subset).

Supported: object (fixed properties, required or all), string (+ enum,
pattern), integer, number, boolean, null, array (items, minItems/maxItems),
enum/const of scalars, $ref-free nesting.
"""
import json
import re
from typing import Any, Dict, Union

_WS = r"[ \n\t]*"
_STRING_INNER = r'[^"\\]'
STRING_RE = f'"{_STRING_INNER}*"'
INTEGER_RE = r"(-)?(0|[1-9][0-9]*)"
NUMBER_RE = r"(-)?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-][0-9]+)?"
BOOLEAN_RE = r"(true|false)"
NULL_RE = r"null"


def _escape_literal(value: Any) -> str:
    return re.escape(json.dumps(value))


def schema_to_regex(schema: Union[str, Dict[str, Any]]) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _to_regex(schema)


def _to_regex(s: Dict[str, Any]) -> str:
    if "enum" in s:
        return "(" + "|".join(_escape_literal(v) for v in s["enum"]) + ")"
    if "const" in s:
        return _escape_literal(s["const"])
    if "anyOf" in s or "oneOf" in s:
        subs = s.get("anyOf") or s.get("oneOf")
        return "(" + "|".join(_to_regex(x) for x in subs) + ")"
    t = s.get("type")
    if isinstance(t, list):
        return "(" + "|".join(_to_regex({**s, "type": x}) for x in t) + ")"
    if t == "string":
        if "pattern" in s:
            return f'"{s["pattern"]}"'
        if "maxLength" in s or "minLength" in s:
            lo = int(s.get("minLength", 0))
            hi = s.get("maxLength")
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{_STRING_INNER}{rep}"'
        return STRING_RE
    if t == "integer":
        return INTEGER_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOLEAN_RE
    if t == "null":
        return NULL_RE
    if t == "array":
        item = _to_regex(s.get("items", {}))
        lo = int(s.get("minItems", 0))
        hi = s.get("maxItems")
        if lo == 0 and hi is None:
            body = f"({item}({_WS},{_WS}{item})*)?"
        else:
            extra_lo = max(lo - 1, 0)
            extra = f"({_WS},{_WS}{item})"
            if hi is None:
                tail = f"{extra}{{{extra_lo},}}"
            else:
                tail = f"{extra}{{{extra_lo},{max(hi - 1, 0)}}}"
            body = f"{item}{tail}" if lo > 0 else \
                f"({item}{tail})?"
        return rf"\[{_WS}{body}{_WS}\]"
    if t == "object" or "properties" in s:
        props = s.get("properties", {})
        required = set(s.get("required", list(props)))
        parts = []
        for name, sub in props.items():
            pair = (f'"{re.escape(name)}"{_WS}:{_WS}{_to_regex(sub)}')
            parts.append((pair, name in required))
        if not parts:
            return rf"\{{{_WS}\}}"
        # fixed property order (like outlines); optional props may be
        # omitted only from the tail to keep the regex tractable
        body = ""
        first = True
        for pair, req in parts:
            sep = "" if first else f"{_WS},{_WS}"
            piece = f"{sep}{pair}"
            body += piece if req else f"({piece})?"
            first = False
        return rf"\{{{_WS}{body}{_WS}\}}"
    # unconstrained: any JSON scalar/string
    return f"({STRING_RE}|{NUMBER_RE}|{BOOLEAN_RE}|{NULL_RE})"
