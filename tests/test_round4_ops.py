"""Round-4 ADVICE regression tests: disjunctive_revenue edge cases
(empty arm vs the UNION ALL oracle, half-up quantity rounding, empty
part table) and NULL-FK semantics (a NULL key matches NOTHING on every
membership path — broadcast probe, co-partitioned fallback, and the
fused referential-audit pass — mirroring SQL's `x = NULL is never
true`)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _df(res) -> pd.DataFrame:
    import ray

    if isinstance(res, pa.Table):
        return res.to_pandas()
    parts = [ray.get(r) for r in res.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows] or parts[:1]
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def _mini(tmp_path, parts, lineitems) -> str:
    """part + lineitem only — all disjunctive_revenue needs."""
    pq.write_table(pa.table({
        "p_partkey": pa.array([p[0] for p in parts], pa.int64()),
        "p_brand": pa.array([p[1] for p in parts]),
        "p_size": pa.array([p[2] for p in parts], pa.int32()),
    }), tmp_path / "part.parquet")
    n = len(lineitems)
    pq.write_table(pa.table({
        "l_partkey": pa.array([li[0] for li in lineitems], pa.int64()),
        "l_quantity": pa.array([float(li[1]) for li in lineitems]),
        "l_extendedprice": pa.array([float(li[2]) for li in lineitems]),
        "l_discount": pa.array([0.0] * n),
    }), tmp_path / "lineitem.parquet")
    return str(tmp_path)


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in ("part", "lineitem"):
        con.register(name, pq.read_table(f"{sf}/{name}.parquet"))
    return con.sql(sql).df()


def test_disjunctive_revenue_empty_arm_matches_oracle(ray_session,
                                                      tmp_path):
    """An arm matching ZERO rows must be absent from BOTH sides: the
    ungrouped UNION ALL leg would emit (arm, 0, NULL) without the
    n_items > 0 guard while the Ray groupby omits it (ADVICE r3 #1)."""
    from nativeextractor_ray.pipelines.relational import (
        disjunctive_revenue, disjunctive_revenue_sql)

    arms = [("hit", "B1", 1, 10, 1, 10),
            ("empty", "NoSuchBrand", 1, 10, 1, 10)]
    sf = _mini(tmp_path, parts=[(10, "B1", 5)],
               lineitems=[(10, 5, 100.0)])
    got = _df(disjunctive_revenue(sf, arms=arms))
    want = _oracle(sf, disjunctive_revenue_sql(arms=arms))
    assert list(got["arm"]) == ["hit"]
    got = got.sort_values("arm").reset_index(drop=True)
    want = want.sort_values("arm").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_disjunctive_revenue_half_up_quantity(ray_session, tmp_path):
    """Non-integral quantities round HALF-UP on both sides (2.7 -> 3,
    3.5 -> 4): astype(int64) truncation would disagree with DuckDB's
    rounding CAST (ADVICE r3 #2)."""
    from nativeextractor_ray.pipelines.relational import (
        disjunctive_revenue, disjunctive_revenue_sql)

    arms = [("three", "B1", 1, 10, 3, 3),
            ("four", "B1", 1, 10, 4, 4)]
    sf = _mini(tmp_path, parts=[(10, "B1", 5)],
               lineitems=[(10, 2.7, 100.0),   # -> 3 (truncation says 2)
                          (10, 3.5, 200.0),   # -> 4 (half-up)
                          (10, 2.4, 400.0)])  # -> 2, no arm
    got = _df(disjunctive_revenue(sf, arms=arms)).sort_values(
        "arm").reset_index(drop=True)
    want = _oracle(sf, disjunctive_revenue_sql(arms=arms)).sort_values(
        "arm").reset_index(drop=True)
    assert list(got["arm"]) == ["four", "three"]
    assert list(got["revenue_c"]) == [20000, 10000]
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_disjunctive_revenue_empty_part_table(ray_session, tmp_path):
    """An empty part table yields zero arms, not an IndexError on the
    empty broadcast key array (ADVICE r3 #3)."""
    from nativeextractor_ray.pipelines.relational import disjunctive_revenue

    sf = _mini(tmp_path, parts=[], lineitems=[(10, 5, 100.0)])
    got = _df(disjunctive_revenue(sf))
    assert len(got) == 0


def _null_fk_star(tmp_path) -> str:
    """Minimal referentially-typed star with NULL FKs planted: one null
    l_orderkey, one null o_custkey, plus one genuine int orphan each."""
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["R"]),
    }), tmp_path / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1], pa.int32()),
        "n_name": pa.array(["N1"]),
        "n_regionkey": pa.array([0], pa.int32()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([1, 1], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0]),
        "c_mktsegment": pa.array(["S", "S"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["s"]),
        "s_nationkey": pa.array([1], pa.int32()),
        "s_acctbal": pa.array([0.0]),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": pa.array(["p"]),
        "p_brand": pa.array(["B"]),
        "p_type": pa.array(["t"]),
        "p_size": pa.array([1], pa.int32()),
        "p_retailprice": pa.array([1.0]),
    }), tmp_path / "part.parquet")
    # o_custkey: 1 ok, NULL orphan, 99 int orphan
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        "o_custkey": pa.array([1, None, 99], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([1.0] * 3),
        "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"]),
    }), tmp_path / "orders.parquet")
    # l_orderkey: 10 ok, NULL orphan, 77 int orphan, 20 ok
    n = 4
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, None, 77, 20], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_audit_null_fk_is_orphan_on_both_paths(ray_session, tmp_path):
    """A NULL FK counts as an orphan (NOT-EXISTS semantics) on the
    fused broadcast pass AND the co-partitioned fallback, and both
    agree with the DuckDB oracle (ADVICE r3 #4)."""
    from nativeextractor_ray.pipelines.audit import (
        referential_audit, referential_audit_sql)

    sf = _null_fk_star(tmp_path)
    fused = referential_audit(sf)
    fallback = referential_audit(sf, broadcast_bound=0)
    assert fused.to_pylist() == fallback.to_pylist()

    rows = {r["edge"]: (r["n_rows"], r["n_orphans"])
            for r in fused.to_pylist()}
    assert rows["lineitem->orders"] == (4, 2)   # NULL + 77
    assert rows["orders->customer"] == (3, 2)   # NULL + 99

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        con.register(name, pq.read_table(f"{sf}/{name}.parquet"))
    want = con.sql(referential_audit_sql()).df()
    got = fused.to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("edge").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values("edge").reset_index(drop=True)[sorted(want.columns)],
        check_dtype=False)


def test_semi_anti_join_null_key_both_paths(ray_session, tmp_path):
    """semi drops / anti keeps a NULL-keyed left row on the broadcast
    AND shuffle paths, and non-null exactness survives (no float64
    widening of the probe column)."""
    import ray.data

    import nativeextractor_ray.pipelines.relational as rel

    left = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "fk": pa.array([100, None, 200, 999], pa.int64()),
    })
    keys = pa.table({"k": pa.array([100, 200, None], pa.int64())})

    for bound in (rel.SEMI_BROADCAST_BOUND, 0):
        old = rel.SEMI_BROADCAST_BOUND
        rel.SEMI_BROADCAST_BOUND = bound
        try:
            semi = _df(rel.semi_anti_join(
                ray.data.from_arrow(left), ray.data.from_arrow(keys),
                "fk", anti=False))
            anti = _df(rel.semi_anti_join(
                ray.data.from_arrow(left), ray.data.from_arrow(keys),
                "fk", anti=True))
        finally:
            rel.SEMI_BROADCAST_BOUND = old
        assert sorted(semi["id"]) == [1, 3], f"bound={bound}"
        assert sorted(anti["id"]) == [2, 4], f"bound={bound}"
