"""Pre-flight for the driver's correctness gate: run every queries() entry
at sf0.001 and compare row-for-row against its oracle_sql() via DuckDB
(order-insensitive, schema-sensitive)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    from nativeextractor_ray.functions.blocks import arrow_blocks

    # arrow_blocks normalizes the mixed arrow/pandas block formats a
    # map_groups / aggregate pipeline can emit (and skips empty blocks)
    parts = list(arrow_blocks(res, stream=False))
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def _norm(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for name in TABLES:
        c.register(name, pq.read_table(f"{sf_dir}/{name}.parquet"))
    return c


def all_query_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, sf_dir, con, ray_session):
    import __ray_entry__ as e

    got = _norm(_to_table(e.queries()[name](sf_dir)))
    want = _norm(con.sql(e.oracle_sql()[name]).arrow())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    t = _to_table(res)
    assert t.num_rows > 0
    assert set(t.schema.names) == {"subj", "pred", "obj", "support", "first_seen", "prob"}
