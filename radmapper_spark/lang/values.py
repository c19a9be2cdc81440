"""Value model: sequence/container discipline and JSONata singleton rules.

The reference distinguishes result *sequences* (metadata :bi/container?)
from explicit JSON arrays (:bi/json-array?) and applies flattening Rules 1-4
(reference: builtin_macros.cljc:24-98 `jflatten`, tested
builtin_test.cljc:18-42). Here the distinction is a Python type: `JSeq`
(a list subclass) is a sequence; plain `list` is a JSON array.

Rules implemented by `jflatten`:
  1. empty sequence            -> NOMATCH ("no match": key dropped / nothing)
  2. singleton sequence        -> the element itself
  3. nested sequences          -> splice into the outer sequence
  4. explicit JSON arrays      -> left untouched
"""

from __future__ import annotations

from typing import Any


class JSeq(list):
    """A result sequence (container) — subject to flattening rules."""

    __slots__ = ()


class _NoMatch:
    """The 'no match' non-value: a path with no result. Distinct from null
    (JSON null is a real value). Dropped from sequences and object keys."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self) -> str:
        return "NOMATCH"

    def __bool__(self) -> bool:
        return False


NOMATCH = _NoMatch()


def is_nomatch(v: Any) -> bool:
    return v is NOMATCH


def jflatten(v: Any) -> Any:
    """Apply Rules 1-4 to a value. Only the top level collapses to a
    scalar; nested sequences are spliced recursively first."""
    if isinstance(v, JSeq):
        out = _splice(v)
        if len(out) == 0:
            return NOMATCH
        if len(out) == 1:
            return out[0]
        return JSeq(out)
    return v


def _splice(seq: JSeq) -> list:
    out: list = []
    for x in seq:
        if is_nomatch(x):
            continue
        if isinstance(x, JSeq):
            out.extend(_splice(x))
        else:
            out.append(x)
    return out


def containerize(v: Any) -> JSeq:
    """View a value as a sequence for mapping: sequences stay, JSON arrays
    map element-wise, scalars/objects are singleton sequences
    (singleton equivalence, reference builtin_macros.cljc:24-32)."""
    if hasattr(v, "__rm_force__"):
        v = v.__rm_force__()
    if is_nomatch(v):
        return JSeq()
    if isinstance(v, JSeq):
        return JSeq(_splice(v))
    if isinstance(v, list):
        return JSeq(v)
    return JSeq([v])


def as_array(v: Any) -> list:
    """View a value as an indexable array (for [] filters): arrays and
    sequences as-is, scalar as one-element array ('abc'[0] => 'abc')."""
    if hasattr(v, "__rm_force__"):
        v = v.__rm_force__()
    if is_nomatch(v):
        return []
    if isinstance(v, JSeq):
        return _splice(v)
    if isinstance(v, list):
        return v
    return [v]


def finalize(v: Any) -> Any:
    """Engine-boundary cleanup: flatten, NOMATCH -> None, JSeq -> list."""
    v = jflatten(v)
    if is_nomatch(v):
        return None
    return _strip(v)


def _strip(v: Any) -> Any:
    if isinstance(v, JSeq):
        return [_strip(x) for x in _splice(v)]
    if isinstance(v, list):
        return [None if is_nomatch(x) else _strip(x) for x in v]
    if isinstance(v, dict):
        return {k: _strip(x) for k, x in v.items() if not is_nomatch(x)}
    return v


def truthy(v: Any) -> bool:
    """JSONata truthiness (reference builtin.cljc:943-968 `$boolean`):
    false/null/0/''/empty array/empty object/NOMATCH are false; arrays are
    true iff any element is truthy; functions are false."""
    v = jflatten(v)
    if is_nomatch(v) or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, list):
        return any(truthy(x) for x in v)
    if isinstance(v, dict):
        return len(v) > 0
    if callable(v):
        return False
    return True


def deep_eq(a: Any, b: Any) -> bool:
    """Deep structural equality post-flattening (reference builtin.cljc:152)."""
    a, b = jflatten(a), jflatten(b)
    if isinstance(a, JSeq):
        a = list(a)
    if isinstance(b, JSeq):
        b = list(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b if isinstance(a, bool) and isinstance(b, bool) else False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(deep_eq(a[k], b[k]) for k in a)
    return a == b
