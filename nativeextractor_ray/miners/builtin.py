"""Built-in FSM-family miners: email, URL, date, phone, number.

The reference ships ``naive_email_miner`` as its canonical hand-written FSM
example (``/root/reference/src/example/naive_email_miner.c:29-148``) and
references non-free ``web_entities`` (match_url/match_email) and
``naive_date`` miners from its tests/CLI
(``tests/extractor.c:71-102``, ``src/example/ngrep.c:33-35``); those .so
files are not in the repo, so URL/date/phone semantics here are this
engine's own, designed to be SQL-reproducible for the correctness oracle.

EmailMiner reproduces naive_email semantics:
- anchor on ``@``; left context: at least one of [alnum - . _] scanning
  left (:29-41,49-63); right context: dot-separated subdomains of
  [alnum - _], at least 2 subdomains, last subdomain >= 2 chars, empty
  *inner* subdomains allowed (consecutive dots) (:66-112); prob 1.0; no
  backtracking — a bad last subdomain fails the whole attempt rather than
  shrinking the domain (match loop at :76-95).
- documented divergence: the reference's left scan rests the cursor ON the
  first invalid char (or at BOF) before ``mark_start``, so its spans can
  include one leading junk char (naive_email_miner.c:49-63 + miner.c:35-42);
  we start at the leftmost *valid* char instead.

The regex-based miners compile once per instance (per actor) — the analogue
of the reference's compile-to-.so economics.
"""

from __future__ import annotations

import re

from nativeextractor_ray.miners.base import Miner, register_miner
from nativeextractor_ray.unicode import is_alnum


def _email_valid(c: str) -> bool:
    # match_email_valid_chars (naive_email_miner.c:29-41)
    return is_alnum(c) or c in "-._"


def _domain_char(c: str) -> bool:
    # match_domain_chars (naive_email_miner.c:44-46)
    return _email_valid(c) and c != "."


class EmailMiner(Miner):
    label = "Email"  # miner name stamp (naive_email_miner.c:153)

    def find(self, text: str):
        out = []
        n = len(text)
        end_last = 0
        at = text.find("@")
        while at != -1:
            span = self._attempt(text, at, n, end_last)
            if span is not None:
                out.append(span)
                end_last = span[1]
                at = text.find("@", span[1])
            else:
                at = text.find("@", at + 1)
        return out

    @staticmethod
    def _attempt(text: str, at: int, n: int, end_last: int):
        # left context (validate_left_context)
        if at == 0 or not _email_valid(text[at - 1]):
            return None
        j = at - 1
        while j > 0 and _email_valid(text[j - 1]):
            j -= 1
        start = j
        # right context (validate_domain)
        q = at + 1
        subdomains = 0
        last_start = q
        while True:
            while q < n and _domain_char(text[q]):
                q += 1
            if q < n and text[q] == ".":
                q += 1
                subdomains += 1
                last_start = q
            else:
                subdomains += 1
                break
        if subdomains < 2 or q - last_start < 2:
            return None
        if start < end_last:  # mark_start refusal (miner.c:36-38)
            return None
        return (start, q, 1.0)


class _ReMiner(Miner):
    """Shared base for leftmost-greedy compiled-regex miners."""

    pattern: str

    def __init__(self, label: str | None = None):
        if label is not None:
            self.label = label
        self._re = re.compile(self.pattern)

    def find(self, text: str):
        return [(m.start(), m.end(), 1.0) for m in self._re.finditer(text)]


class UrlMiner(_ReMiner):
    """web_entities match_url analogue: scheme + non-space run."""

    label = "Url"
    pattern = r"https?://[^\s]+"


class DateMiner(_ReMiner):
    """naive_date analogue: ISO (YYYY-MM-DD) or dotted (D.M.YYYY) dates."""

    label = "Date"
    pattern = r"[0-9]{4}-[0-9]{2}-[0-9]{2}|[0-9]{1,2}\.[0-9]{1,2}\.[0-9]{4}"


class PhoneMiner(_ReMiner):
    """International-format phone: '+' followed by 9-12 digits."""

    label = "Phone"
    pattern = r"\+[0-9]{9,12}"


class NumberMiner(_ReMiner):
    label = "Number"
    pattern = r"[0-9]+(?:\.[0-9]+)?"


register_miner("email", EmailMiner)
register_miner("match_email", EmailMiner)
register_miner("url", UrlMiner)
register_miner("match_url", UrlMiner)
register_miner("date", DateMiner)
register_miner("naive_date", DateMiner)
register_miner("phone", PhoneMiner)
register_miner("number", NumberMiner)
