"""CSV cell miner — RFC-4180 cells emitted as occurrences (SURVEY §2 C6).

Behavioral re-derivation of the reference's ``match_csv``
(``/root/reference/src/csv_parser.c:95-160``) and its parse loop
(``:178-220``):

- a QUOTED cell starts after the opening quote; doubled quotes (``""``)
  are consumed as content (the span keeps them verbatim — the reference
  does not unescape); the span ends before the closing quote, which must
  be present (an unterminated quote is malformed → the scan stops, the
  parse loop's "not entirely parsed" path);
- an UNQUOTED cell runs to the first quote/delimiter/CR/LF;
- the cell only EMITS when followed by the delimiter, a newline
  (``\\r\\n``/``\\n``/``\\r``), or end of input — the terminator is
  consumed by the cursor but excluded from the span;
- ``allow_empty=true``: zero-length cells are real occurrences
  (``a,,b`` has three cells);
- a trailing delimiter at EOF yields one final empty cell
  (``csv_parser_parse``'s ``was_delimiter`` tail, ``:206-212``).

Unlike the free-scanning miners this is a sequential tokenizer: each
attempt starts where the previous cell's terminator ended, and a malformed
attempt stops the scan (mirroring the reference parse loop, which treats
NULL as a parse error rather than advancing one position).

``row_breaks`` reproduces ``csv_batch_add_newline``: the indices (into the
emitted cell list) after which a row ended.
"""

from __future__ import annotations

from nativeextractor_ray.miners.base import Miner, register_miner


class CsvCellMiner(Miner):
    label = "CSV"

    def __init__(self, delimiter: str = ",", quote: str = '"',
                 label: str = "CSV"):
        if len(delimiter) != 1 or len(quote) != 1:
            raise ValueError("delimiter and quote must be single characters")
        self.delimiter = delimiter
        self.quote = quote
        self.label = label

    # -- one attempt at position c: (start, end, cursor_after, terminator)
    def _match_cell(self, text: str, c: int):
        n = len(text)
        q, d = self.quote, self.delimiter
        if c < n and text[c] == q:
            c += 1                       # opening quote consumed
            start = c
            while c < n:
                if text.startswith(q + q, c):
                    c += 2               # escaped quote: content, keep going
                    continue
                if text[c] == q:
                    break
                c += 1
            end = c
            if c >= n or text[c] != q:
                return None              # unterminated quote → malformed
            c += 1                       # closing quote consumed
        else:
            start = c
            while c < n and text[c] not in (q, d, "\n", "\r"):
                c += 1
            end = c
        # terminator decides whether the cell emits (csv_parser.c:137-158)
        if c < n and text[c] == d:
            return start, end, c + 1, "delimiter"
        if text.startswith("\r\n", c):
            return start, end, c + 2, "newline"
        if c < n and text[c] in ("\n", "\r"):
            return start, end, c + 1, "newline"
        if c >= n:
            return start, end, c, "eof"
        return None                      # e.g. stray quote mid-cell

    def scan_cells(self, text: str):
        """(spans, row_breaks): every cell as (start, end, prob), plus the
        cell indices after which a row ended."""
        spans: list[tuple[int, int, float]] = []
        row_breaks: list[int] = []
        n = len(text)
        c = 0
        term = None
        while c < n:
            m = self._match_cell(text, c)
            if m is None:
                term = None
                break                    # "not entirely parsed"
            start, end, c, term = m
            spans.append((start, end, 1.0))
            if term in ("newline", "eof"):
                row_breaks.append(len(spans))
        if term == "delimiter":          # trailing empty cell at EOF
            spans.append((n, n, 1.0))
            row_breaks.append(len(spans))
        return spans, row_breaks

    def find(self, text: str):
        return self.scan_cells(text)[0]


register_miner("csv", CsvCellMiner)
