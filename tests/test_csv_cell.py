"""CSV cell miner (C6) vs the reference ``match_csv`` semantics
(/root/reference/src/csv_parser.c:95-160, parse loop :178-220)."""

import pyarrow as pa
import pyarrow.csv as pacsv
import pytest

from nativeextractor_ray.miners import CsvCellMiner, make_miner, registered_miners


def cells(text, **kw):
    m = CsvCellMiner(**kw)
    return [text[a:b] for a, b, _ in m.find(text)]


def rows(text, **kw):
    m = CsvCellMiner(**kw)
    spans, breaks = m.scan_cells(text)
    out, prev = [], 0
    for b in breaks:
        out.append([text[s:e] for s, e, _ in spans[prev:b]])
        prev = b
    return out


def test_registered():
    assert "csv" in registered_miners()
    assert isinstance(make_miner("csv"), CsvCellMiner)


def test_basic_rows():
    assert rows("a,b,c\n1,2,3\n") == [["a", "b", "c"], ["1", "2", "3"]]
    # no trailing newline: last cell terminates at EOF
    assert rows("a,b\n1,2") == [["a", "b"], ["1", "2"]]


def test_empty_cells_allow_empty():
    # allow_empty=true (csv_parser_init): zero-length cells are occurrences
    assert cells("a,,b") == ["a", "", "b"]
    assert cells(",") == ["", ""]
    assert cells("\n") == [""]


def test_trailing_delimiter_tail_cell():
    # csv_parser_parse:206-212 — was_delimiter at EOF emits one empty cell
    assert cells("a,") == ["a", ""]
    assert rows("a,b,\n") == [["a", "b", ""]]


def test_quoted_cells():
    assert cells('"a,b",c') == ["a,b", "c"]
    assert cells('"line\nbreak",x') == ["line\nbreak", "x"]
    # doubled quote consumed as content, NOT unescaped (the reference span
    # keeps the raw bytes between the outer quotes)
    assert cells('"he said ""hi""",y') == ['he said ""hi""', "y"]


def test_crlf_and_cr():
    assert rows("a,b\r\nc,d\r") == [["a", "b"], ["c", "d"]]


def test_malformed_stops_scan():
    # stray quote after a closed quoted cell → the parse stops (the
    # reference prints "not entirely parsed" and breaks)
    assert cells('"a"x,b') == []
    # unterminated quote → no occurrence
    assert cells('"abc') == []
    # malformed later: earlier cells are kept
    assert cells('ok,"a"x') == ["ok"]


def test_custom_delimiter():
    assert cells("a;b;c", delimiter=";") == ["a", "b", "c"]


def test_span_positions():
    spans = CsvCellMiner().find('"ab",c')
    assert spans == [(1, 3, 1.0), (5, 6, 1.0)]


def test_matches_arrow_csv_on_wellformed():
    """On well-formed input the miner's row/cell structure equals Arrow's
    CSV reader (the S4 delegation) — ties C6 to the production path.
    Arrow unescapes doubled quotes; the reference span keeps raw content,
    so compare after unescaping."""
    text = 'x,y,z\n1,"a,b",3\n4,"q ""r""",6\n'
    got = [[c.replace('""', '"') for c in row] for row in rows(text)]
    table = pacsv.read_csv(
        pa.py_buffer(text.encode()),
        read_options=pacsv.ReadOptions(autogenerate_column_names=True),
    )
    want = [list(t) for t in zip(*(
        [v.as_py() for v in col] for col in table.columns))]
    assert got == want
