"""The Python transcripts derivation and its SQL rendering must be
bit-identical — every oracle query builds on this CTE."""

import duckdb
import pyarrow.parquet as pq

from nativeextractor_ray.sources.transcripts import (
    TRANSCRIPTS_SQL,
    derive_transcripts_table,
)


def test_python_equals_sql(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    py = derive_transcripts_table(docs)

    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{sf_dir}/documents.parquet"))
    sql = con.sql(f"SELECT * FROM ({TRANSCRIPTS_SQL}) ORDER BY conv_id, turn_idx").arrow()

    py_sorted = py.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert py_sorted.schema.names == sql.schema.names
    for name in py_sorted.schema.names:
        assert py_sorted.column(name).to_pylist() == sql.column(name).to_pylist(), name


def test_shape_invariants(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = derive_transcripts_table(docs)
    assert t.schema.field("turn_idx").type == "int32"
    assert t.schema.field("ts").type == "timestamp[us]"
    # (conv_id, turn_idx) unique — the stable-ordering invariant's key
    keys = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
    assert len(keys) == len(set(keys))
    # the hot conversation exists and is heavy (~5%)
    n_hot = sum(1 for c, _ in keys if c == "c_hot")
    assert n_hot >= 0.04 * len(keys)
    # duplicate-text groups exist (for the dedup operators)
    texts = t.column("text").to_pylist()
    assert len(set(texts)) < len(texts)
