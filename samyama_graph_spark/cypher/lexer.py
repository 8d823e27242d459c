"""Cypher tokenizer.

Token categories: KEYWORD (case-insensitive reserved words), IDENT,
INT, FLOAT, STRING, PARAM ($name), and punctuation/operator tokens.
Mirrors the lexical surface of the reference grammar
(src/query/cypher.pest; ~200 lines) without porting it.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "match", "optional", "where", "return", "distinct", "with", "unwind",
    "as", "order", "by", "asc", "ascending", "desc", "descending", "skip",
    "limit", "union", "all", "and", "or", "xor", "not", "in", "starts",
    "ends", "contains", "is", "null", "true", "false", "case", "when",
    "then", "else", "end", "exists", "count", "any", "none", "single",
    "reduce", "call", "yield", "create", "merge", "delete", "detach",
    "set", "remove", "foreach", "on", "shortestpath", "allshortestpaths",
}

PUNCT = [
    "<=", ">=", "<>", "=~", "->", "<-", "..", "+=",
    "(", ")", "[", "]", "{", "}", ",", ".", ":", ";", "|",
    "=", "<", ">", "+", "-", "*", "/", "%", "^", "$",
]


@dataclass
class Token:
    kind: str  # KEYWORD | IDENT | INT | FLOAT | STRING | PARAM | PUNCT | EOF
    value: str
    pos: int


class LexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":  # line comment
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":  # block comment
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and text[j] != c:
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", c: c}.get(
                            esc, esc
                        )
                    )
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            out.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c == "`":  # backtick-quoted identifier
            j = text.find("`", i + 1)
            if j < 0:
                raise LexError(f"unterminated backtick identifier at {i}")
            out.append(Token("IDENT", text[i + 1 : j], i))
            i = j + 1
            continue
        if c.isdigit():
            j = i
            isfloat = False
            while j < n and text[j].isdigit():
                j += 1
            # ".." is a range, "." followed by digit is a decimal point
            if j < n - 1 and text[j] == "." and text[j + 1].isdigit():
                isfloat = True
                j += 1
                while j < n and text[j].isdigit():
                    j += 1
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    isfloat = True
                    j = k
                    while j < n and text[j].isdigit():
                        j += 1
            out.append(Token("FLOAT" if isfloat else "INT", text[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            if word.lower() in KEYWORDS:
                # keep original case: keywords double as labels/props
                out.append(Token("KEYWORD", word, i))
            else:
                out.append(Token("IDENT", word, i))
            i = j
            continue
        if c == "$":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            if j == i + 1:
                raise LexError(f"bare $ at {i}")
            out.append(Token("PARAM", text[i + 1 : j], i))
            i = j
            continue
        for p in PUNCT:
            if text.startswith(p, i):
                out.append(Token("PUNCT", p, i))
                i += len(p)
                break
        else:
            raise LexError(f"unexpected character {c!r} at {i}")
    out.append(Token("EOF", "", n))
    return out
