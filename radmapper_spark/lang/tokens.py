"""Tokenizer for the RM expression language (JSONata-dialect).

Token surface follows the reference grammar (reference: parse.cljc:40-90
keyword/operator tables, :117-156 regex literals, :335-336 numbers) but the
implementation is a fresh single-pass scanner over the whole source string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

KEYWORDS = {
    "true", "false", "null", "function", "query", "express", "key", "rule",
    "and", "or", "in",
}

# multi-char operators, longest first
MULTI_OPS = ["<|", "|>", ":=", "<=", ">=", "!=", "..", "~>", "?:"]
SINGLE_OPS = set("[](){}=,.;:*+-/<>%&?|!")

NUM_RE = re.compile(r"-?\d+(\.\d+)?([eE][-+]?\d+)?")
IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
VAR_RE = re.compile(r"\$\$?[a-zA-Z_][a-zA-Z0-9_]*|\$\$|\$")
QVAR_RE = re.compile(r"\?[a-zA-Z_][a-zA-Z0-9_-]*")
KW_IDENT_RE = re.compile(r":[a-zA-Z_][a-zA-Z0-9_/\.\-]*")  # datalog attr keywords  :a/b


@dataclass
class Tok:
    kind: str  # num str ident var qvar kw regex op keyword eof bq-ident
    val: Any
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}:{self.val!r}"


class TokenizeError(ValueError):
    pass


def _read_string(src: str, i: int, quote: str) -> tuple[str, int]:
    out = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == "\\":
            nxt = src[i + 1]
            esc = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                   "'": "'", '"': '"', "\\": "\\", "/": "/"}
            if nxt == "u":
                out.append(chr(int(src[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt not in esc:
                raise TokenizeError(f"bad escape \\{nxt} at {i}")
            out.append(esc[nxt])
            i += 2
            continue
        if c == quote:
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise TokenizeError("unterminated string")


def _regex_allowed(toks: list[Tok]) -> bool:
    """A '/' starts a regex literal when it cannot be a division operator:
    at expression start, after an operator, comma, or open bracket."""
    if not toks:
        return True
    t = toks[-1]
    if t.kind == "op" and t.val not in ("]", ")", "}"):
        return True
    if t.kind == "keyword" and t.val in ("and", "or", "in"):
        return True
    return False


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise TokenizeError("unterminated comment")
            i = j + 2
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c in "'\"":
            s, i2 = _read_string(src, i, c)
            toks.append(Tok("str", s, i))
            i = i2
            continue
        if c == "`":
            j = src.find("`", i + 1)
            if j < 0:
                raise TokenizeError("unterminated backquoted ident")
            toks.append(Tok("ident", src[i + 1:j], i))
            i = j + 1
            continue
        if c == "/" and _regex_allowed(toks):
            # regex literal /pat/flags
            j = i + 1
            pat = []
            while j < n and src[j] != "/":
                if src[j] == "\\":
                    pat.append(src[j:j + 2])
                    j += 2
                    continue
                pat.append(src[j])
                j += 1
            if j >= n:
                raise TokenizeError("unterminated regex")
            j += 1
            flags = ""
            while j < n and src[j] in "imsx":
                flags += src[j]
                j += 1
            toks.append(Tok("regex", ("".join(pat), flags), i))
            i = j
            continue
        m = VAR_RE.match(src, i)
        if c == "$" and m:
            toks.append(Tok("var", m.group(0), i))
            i = m.end()
            continue
        m = QVAR_RE.match(src, i)
        if c == "?" and m:
            toks.append(Tok("qvar", m.group(0), i))
            i = m.end()
            continue
        m = KW_IDENT_RE.match(src, i)
        if c == ":" and m and toks and toks[-1].kind == "op" and toks[-1].val in ("[", ","):
            # datalog attribute keyword inside a triple pattern
            toks.append(Tok("kw", m.group(0), i))
            i = m.end()
            continue
        if c.isdigit() or (c == "-" and i + 1 < n and src[i + 1].isdigit() and _num_allowed(toks)):
            m = NUM_RE.match(src, i)
            text = m.group(0)
            # '..' range must not be eaten as a float dot
            if "." in text and src.startswith("..", i + text.index(".")):
                text = text[: text.index(".")]
            val = float(text) if ("." in text or "e" in text or "E" in text) else int(text)
            toks.append(Tok("num", val, i))
            i = i + len(text)
            continue
        m = IDENT_RE.match(src, i)
        if m:
            word = m.group(0)
            if word in KEYWORDS:
                toks.append(Tok("keyword", word, i))
            else:
                toks.append(Tok("ident", word, i))
            i = m.end()
            continue
        matched = False
        for op in MULTI_OPS:
            if src.startswith(op, i):
                toks.append(Tok("op", op, i))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in SINGLE_OPS:
            toks.append(Tok("op", c, i))
            i += 1
            continue
        raise TokenizeError(f"unexpected char {c!r} at {i}")
    toks.append(Tok("eof", None, n))
    return toks


def _num_allowed(toks: list[Tok]) -> bool:
    """'-1' is a negative literal only where a regex would also be allowed."""
    return _regex_allowed(toks)
