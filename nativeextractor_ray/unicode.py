"""Unicode predicates and span math with reference-parity semantics.

The reference's token-boundary definition is load-bearing for glob and NER
semantics (``/root/reference/src/miner.c:207-211``):

    bool is_delimiter(char* c) {
      return (unicode_isspace(c) || unicode_ispunct(c) || unicode_iscntrl(c));
    }

where the predicates are glib's ``g_unichar_isspace`` (whitespace incl.
Zs/Zl/Zp and \\t \\n \\r \\f \\v), ``g_unichar_ispunct`` (punctuation *or
symbol*, i.e. categories P* and S*), and ``g_unichar_iscntrl`` (ISO controls,
category Cc).  We reproduce that exactly from ``unicodedata`` categories.

Span math: the reference emits BOTH byte offsets/lengths (``pos``/``len``)
and codepoint offsets/lengths (``upos``/``ulen``) per occurrence
(``/root/reference/src/miner.c:273-281``,
``include/nativeextractor/occurrence.h:21-29``).  We scan Python strings
(codepoints) and derive byte offsets via :func:`byte_offsets`, with an ASCII
fast path where byte == codepoint.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache


@lru_cache(maxsize=None)
def is_delimiter(ch: str) -> bool:
    """Reference token-boundary predicate (miner.c:207-211): space|punct|cntrl.

    glib's ispunct covers categories P* *and* S*; iscntrl covers Cc;
    isspace covers Z* plus the ASCII whitespace controls (already Cc).
    """
    cat = unicodedata.category(ch)
    return cat[0] in ("P", "S", "Z") or cat == "Cc"


@lru_cache(maxsize=None)
def is_space(ch: str) -> bool:
    """glib g_unichar_isspace: \\t \\n \\v \\f \\r and Zs/Zl/Zp."""
    return ch in "\t\n\v\f\r " or unicodedata.category(ch).startswith("Z")


@lru_cache(maxsize=None)
def is_alnum(ch: str) -> bool:
    """glib g_unichar_isalnum: letter or digit categories (L*, Nd/Nl/No)."""
    cat = unicodedata.category(ch)
    return cat[0] in ("L", "N")


def not_isspace(ch: str) -> bool:
    return not is_space(ch)


# A compact, eagerly-computed delimiter string for the Basic Latin + Latin-1
# range — used to build vectorized regex character classes in fast paths.
ASCII_DELIMS = "".join(chr(c) for c in range(0x20, 0x100) if is_delimiter(chr(c)))


def byte_offsets(text: str):
    """Return ``None`` for pure-ASCII text (byte offset == codepoint offset),
    else a list ``off`` with ``off[i]`` = byte offset of codepoint ``i`` and
    ``off[len(text)]`` = total byte length.
    """
    if text.isascii():
        return None
    off = [0] * (len(text) + 1)
    total = 0
    for i, ch in enumerate(text):
        off[i] = total
        # standard UTF-8 width; equals the reference's unicode_getbytesize
        # (include/nativeextractor/unicode.h:36-44) for all valid input
        c = ord(ch)
        total += 1 if c < 0x80 else 2 if c < 0x800 else 3 if c < 0x10000 else 4
    off[len(text)] = total
    return off


def to_byte_span(off, u0: int, u1: int) -> tuple[int, int]:
    """Codepoint span [u0, u1) → (byte_pos, byte_len) given a byte_offsets
    result (``None`` means ASCII identity)."""
    if off is None:
        return u0, u1 - u0
    return off[u0], off[u1] - off[u0]
