"""Minimal EDN reader for reference fixtures (`$get('*.edn')`).

Covers the subset the reference's data files use (maps, vectors, sets,
keywords, strings, numbers, booleans, nil, comments). Keywords become
strings: in KEY position ':ns/name' -> 'ns/name' (matching how the engine
names attributes), in VALUE position -> ':ns/name' (so datalog literals
like :owl/Class compare equal).
"""

from __future__ import annotations

from typing import Any


class EdnError(ValueError):
    pass


class _Keyword(str):
    """Marker wrapper during parse; resolved by context (key vs value)."""

    __slots__ = ()


def loads(src: str) -> Any:
    p = _Parser(src)
    v = p.parse()
    p.skip_ws()
    return _resolve(v, key_pos=False)


def load_file(path: str) -> Any:
    with open(path) as f:
        return loads(f.read())


def _resolve(v, key_pos: bool):
    if isinstance(v, _Keyword):
        return str(v)[1:] if key_pos else str(v)
    if isinstance(v, list):
        return [_resolve(x, False) for x in v]
    if isinstance(v, dict):
        return {_resolve(k, True): _resolve(x, False) for k, x in v.items()}
    return v


class _Parser:
    def __init__(self, src: str):
        self.s = src
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in " \t\r\n,":
                self.i += 1
            elif c == ";":
                j = self.s.find("\n", self.i)
                self.i = len(self.s) if j < 0 else j + 1
            else:
                return

    def parse(self) -> Any:
        self.skip_ws()
        if self.i >= len(self.s):
            raise EdnError("unexpected end of input")
        c = self.s[self.i]
        if c == "[":
            return self._seq("]")
        if c == "(":
            return self._seq(")")
        if c == "{":
            return self._map()
        if self.s.startswith("#{", self.i):
            self.i += 1
            return self._seq("}")
        if c == '"':
            return self._string()
        if c == ":":
            return self._keyword()
        return self._atom()

    def _seq(self, close: str) -> list:
        self.i += 1
        out = []
        while True:
            self.skip_ws()
            if self.i < len(self.s) and self.s[self.i] == close:
                self.i += 1
                return out
            out.append(self.parse())

    def _map(self) -> dict:
        self.i += 1
        out = {}
        while True:
            self.skip_ws()
            if self.i < len(self.s) and self.s[self.i] == "}":
                self.i += 1
                return out
            k = self.parse()
            v = self.parse()
            out[k if not isinstance(k, _Keyword) else k] = v

    def _string(self) -> str:
        self.i += 1
        out = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == "\\":
                esc = self.s[self.i + 1]
                out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\",
                            "r": "\r"}.get(esc, esc))
                self.i += 2
                continue
            if c == '"':
                self.i += 1
                return "".join(out)
            out.append(c)
            self.i += 1
        raise EdnError("unterminated string")

    def _keyword(self) -> _Keyword:
        j = self.i + 1
        while j < len(self.s) and self.s[j] not in ' \t\r\n,[](){}";':
            j += 1
        kw = _Keyword(self.s[self.i:j])
        self.i = j
        return kw

    def _atom(self) -> Any:
        j = self.i
        while j < len(self.s) and self.s[j] not in ' \t\r\n,[](){}";':
            j += 1
        tok = self.s[self.i:j]
        self.i = j
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return tok  # bare symbol -> string
