"""Backslash escaping for the URL query DSL.

Same contract as the reference's string helpers
(/root/reference/bacon/utils/strings.py:6-31): values embedded in the
``/``- and ``:``-separated query string are backslash-escaped, and splitting
honors escapes. Implemented fresh as a small state machine.
"""

from __future__ import annotations

ESCAPE_CHAR = "\\"


def bslash_escape(s: str, specials: str) -> str:
    """Escape every char of *specials* (and the backslash itself) in *s*."""
    out = []
    for ch in s:
        if ch == ESCAPE_CHAR or ch in specials:
            out.append(ESCAPE_CHAR)
        out.append(ch)
    return "".join(out)


def bslash_unescape(s: str) -> str:
    """Drop one level of backslash escaping."""
    out = []
    it = iter(s)
    for ch in it:
        if ch == ESCAPE_CHAR:
            ch = next(it, "")
        out.append(ch)
    return "".join(out)


def bslash_split(s: str, sep: str) -> list[str]:
    """Split *s* on the single-char *sep*, honoring backslash escapes.

    The returned tokens are still escaped; callers unescape after routing
    (mirrors the reference's tokenize-then-parse order,
    /root/reference/bacon/builders/url.py:55-66).
    """
    tokens: list[str] = []
    cur: list[str] = []
    escaped = False
    for ch in s:
        if escaped:
            cur.append(ch)
            escaped = False
        elif ch == ESCAPE_CHAR:
            cur.append(ch)
            escaped = True
        elif ch == sep:
            tokens.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    tokens.append("".join(cur))
    return tokens
