"""Output sinks: parquet/json/csv round-trips + plain formatting."""

import json
from pathlib import Path

import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def _mentions(sf_dir):
    from nativeextractor_ray.pipelines.extract import mentions_dataset

    return mentions_dataset(sf_dir)


def test_parquet_roundtrip(sf_dir, tmp_path, ray_session):
    from nativeextractor_ray.pipelines import io

    ds = _mentions(sf_dir)
    n = ds.count()
    out = str(tmp_path / "m_parquet")
    io.write_parquet(ds, out)
    files = list(Path(out).glob("*.parquet"))
    assert files
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == n


def test_json_roundtrip(sf_dir, tmp_path, ray_session):
    from nativeextractor_ray.pipelines import io

    ds = _mentions(sf_dir)
    n = ds.count()
    out = str(tmp_path / "m_json")
    io.write_json(ds, out)
    rows = 0
    for f in Path(out).glob("*.json"):
        for line in f.read_text().splitlines():
            rec = json.loads(line)
            assert {"conv_id", "label", "pos", "surface"} <= set(rec)
            rows += 1
    assert rows == n


def test_csv_roundtrip(sf_dir, tmp_path, ray_session):
    from nativeextractor_ray.pipelines import io

    ds = _mentions(sf_dir)
    n = ds.count()
    out = str(tmp_path / "m_csv")
    io.write_csv(ds, out)
    rows = 0
    for f in Path(out).glob("*.csv"):
        t = pacsv.read_csv(f)
        assert "surface" in t.schema.names
        rows += t.num_rows
    assert rows == n


def test_plain_format(sf_dir, ray_session):
    from nativeextractor_ray.pipelines import io

    s = io.format_mentions_plain(_mentions(sf_dir), limit=5)
    lines = s.splitlines()
    assert 0 < len(lines) <= 5
    for ln in lines:
        parts = ln.split(";")
        assert len(parts) >= 4 and parts[0].isdigit() and parts[1].isdigit()


def test_parquet_partitioned_layout(sf_dir, tmp_path, ray_session):
    """Hive-style partition_cols layout: one lang=<v>/ directory per key,
    and reading the root back recovers the full table."""
    import os

    import pyarrow.dataset as pads
    import ray.data

    from nativeextractor_ray.pipelines import io
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    out = str(tmp_path / "part_out")
    io.write_parquet_partitioned(ds, out, ["lang"])
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2
    back = pads.dataset(out, partitioning="hive").to_table()
    orig = read_table(sf_dir, "documents", ["doc_id"]).count()
    assert back.num_rows == orig
    # the partition key survives as a readable column
    assert "lang" in back.schema.names
