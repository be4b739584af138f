"""Planted-fixture tests for the round-3g relational shapes:
Q22 scalar-subquery + anti-join (idle_customer_balance), Q2
argmin-per-group join-back with tie retention (min_cost_supplier), and
Q19 disjunctive predicate arms with overlap double-counting
(disjunctive_revenue)."""

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


def _star(tmp_path, customers, orders, parts, suppliers, lineitems) -> str:
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA"]),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
        "c_name": pa.array([f"c{c[0]}" for c in customers]),
        "c_nationkey": pa.array([c[1] for c in customers], pa.int32()),
        "c_acctbal": pa.array([c[2] for c in customers], pa.float64()),
        "c_mktsegment": pa.array(["S"] * len(customers)),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, len(orders) + 1)), pa.int64()),
        "o_custkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(orders)),
        "o_totalprice": pa.array([1.0] * len(orders)),
        "o_orderdate": pa.array([0] * len(orders), pa.timestamp("us")),
        "o_orderpriority": pa.array([o[1] for o in orders]),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([p[0] for p in parts], pa.int64()),
        "p_name": pa.array([f"p{p[0]}" for p in parts]),
        "p_brand": pa.array([p[1] for p in parts]),
        "p_type": pa.array(["t"] * len(parts)),
        "p_size": pa.array([p[2] for p in parts], pa.int32()),
        "p_retailprice": pa.array([1.0] * len(parts)),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([s[0] for s in suppliers], pa.int64()),
        "s_name": pa.array([s[1] for s in suppliers]),
        "s_nationkey": pa.array([0] * len(suppliers), pa.int32()),
        "s_acctbal": pa.array([0.0] * len(suppliers)),
    }), tmp_path / "supplier.parquet")
    n = len(lineitems)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1] * n, pa.int64()),
        "l_partkey": pa.array([li[0] for li in lineitems], pa.int64()),
        "l_suppkey": pa.array([li[1] for li in lineitems], pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
        "l_quantity": pa.array([float(li[3]) for li in lineitems]),
        "l_extendedprice": pa.array([li[2] for li in lineitems],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_idle_customer_balance_planted(ray_session, tmp_path):
    """Threshold averages POSITIVE balances only, the gate is STRICT,
    and only customers without a priority order survive the anti join."""
    from nativeextractor_ray.pipelines.relational import (
        idle_customer_balance)

    # positive balances: 100, 200, 300, 400 -> avg 250.00 (negative and
    # zero excluded from the threshold but still gated rows themselves)
    sf = _star(
        tmp_path,
        customers=[
            (1, 0, 100.0),   # below avg
            (2, 0, 200.0),   # below avg
            (3, 0, 300.0),   # above avg, HAS urgent order -> dropped
            (4, 1, 400.0),   # above avg, no urgent order -> kept
            (5, 1, 250.0),   # == avg: strict > drops it
            (6, 1, -50.0),   # negative: not in threshold, gated out
            (7, 0, 9000.0),  # above avg, only LOW orders -> kept
        ],
        orders=[(3, "1-URGENT"), (7, "5-LOW"), (4, "5-LOW")],
        parts=[(1, "B", 1)], suppliers=[(1, "s1")],
        lineitems=[(1, 1, 10.0, 1)],
    )
    # threshold shifts to (100+200+300+400+250+9000)/6 = 1708.33:
    # above it: 7 (9000, LOW only) -> kept; 4 drops (400 < avg now)
    got = _df(idle_customer_balance(sf)).sort_values(
        "n_name").reset_index(drop=True)
    assert list(got["n_name"]) == ["ALPHA"]
    assert list(got["n_custs"]) == [1]
    assert list(got["total_bal_c"]) == [900000]


def test_min_cost_supplier_ties_and_brand_prune(ray_session, tmp_path):
    """Ties keep BOTH suppliers; duplicate (part, supplier) rows at the
    min collapse to one; other brands never appear."""
    from nativeextractor_ray.pipelines.relational import min_cost_supplier

    sf = _star(
        tmp_path,
        customers=[(1, 0, 0.0)], orders=[(1, "5-LOW")],
        parts=[(10, "Brand#4", 1), (20, "Brand#4", 1), (30, "Other", 1)],
        suppliers=[(1, "s1"), (2, "s2"), (3, "s3")],
        lineitems=[
            (10, 1, 5.00, 1),   # part 10 min, supplier 1
            (10, 2, 5.00, 1),   # tie at min, supplier 2 -> kept too
            (10, 2, 5.00, 1),   # duplicate (10, 2) at min -> one row
            (10, 3, 7.00, 1),   # above min -> dropped
            (20, 3, 9.99, 1),   # part 20's only row -> its min
            (30, 1, 0.01, 1),   # other brand -> pruned map-side
        ],
    )
    got = _df(min_cost_supplier(sf, brand="Brand#4")).sort_values(
        ["p_partkey", "s_suppkey"]).reset_index(drop=True)
    assert list(got["p_partkey"]) == [10, 10, 20]
    assert list(got["s_suppkey"]) == [1, 2, 3]
    assert list(got["min_price_c"]) == [500, 500, 999]
    assert list(got["s_name"]) == ["s1", "s2", "s3"]


def test_disjunctive_revenue_overlap_counts_twice(ray_session, tmp_path):
    """A line satisfying two arms contributes to BOTH (UNION ALL
    semantics, not exclusive buckets); an arm with no hits is absent."""
    from nativeextractor_ray.pipelines.relational import disjunctive_revenue

    arms = [("a", "B1", 1, 10, 1, 10),
            ("b", "B1", 5, 20, 5, 20),
            ("c", "B2", 1, 50, 1, 50)]
    sf = _star(
        tmp_path,
        customers=[(1, 0, 0.0)], orders=[(1, "5-LOW")],
        parts=[(10, "B1", 7), (20, "B1", 15), (30, "B2", 25)],
        suppliers=[(1, "s1")],
        lineitems=[
            (10, 1, 10.00, 7),   # size 7 qty 7 -> arms a AND b
            (20, 1, 20.00, 6),   # size 15 -> arm b only
            (30, 1, 40.00, 60),  # qty 60 out of range -> no arm
        ],
    )
    got = _df(disjunctive_revenue(sf, arms=arms)).sort_values(
        "arm").reset_index(drop=True)
    assert list(got["arm"]) == ["a", "b"]
    assert list(got["n_items"]) == [1, 2]
    assert list(got["revenue_c"]) == [1000, 3000]


def test_nation_trade_volume_planted(ray_session, tmp_path):
    """Both directions count, same-nation trade is excluded, and revenue
    splits by SHIP year (not order year)."""
    import numpy as np

    from nativeextractor_ray.pipelines.relational import nation_trade_volume

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["A", "B", "C"]),
        "n_regionkey": pa.array([0, 0, 0], pa.int32()),
    }), tmp_path / "nation.parquet")
    # customers: 1 in A, 2 in B, 3 in C
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["c1", "c2", "c3"]),
        "c_nationkey": pa.array([0, 1, 2], pa.int32()),
        "c_acctbal": pa.array([0.0] * 3),
        "c_mktsegment": pa.array(["S"] * 3),
    }), tmp_path / "customer.parquet")
    # suppliers: 10 in A, 20 in B
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 20], pa.int64()),
        "s_name": pa.array(["sA", "sB"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0]),
    }), tmp_path / "supplier.parquet")
    # orders: 1 by cust A, 2 by cust B, 3 by cust C
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([1.0] * 3),
        "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["P"] * 3),
    }), tmp_path / "orders.parquet")
    y96 = np.datetime64("1996-06-01", "us")
    y97 = np.datetime64("1997-06-01", "us")
    n = 5
    pq.write_table(pa.table({
        # supp B -> cust A order, split across two ship years;
        # supp A -> cust B; supp A -> own-nation cust A (excluded);
        # supp B -> cust C (C not a target nation: excluded)
        "l_orderkey": pa.array([1, 1, 2, 1, 3], pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([20, 20, 10, 10, 20], pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([10.0, 20.0, 40.0, 80.0, 160.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([y96, y97, y96, y96, y96],
                               pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")

    got = _df(nation_trade_volume(str(tmp_path), "A", "B")).sort_values(
        ["supp_nation", "l_year"]).reset_index(drop=True)
    assert got[["supp_nation", "cust_nation"]].values.tolist() == [
        ["A", "B"], ["B", "A"], ["B", "A"]]
    assert list(got["l_year"]) == [1996, 1996, 1997]
    assert list(got["revenue_c"]) == [4000, 1000, 1000]


def test_audience_overlap_planted(ray_session, tmp_path):
    """Flags merge ACROSS batches (a user's a-event and b-event in
    different blocks still land in 'both'); empty segments are absent."""
    import numpy as np

    from nativeextractor_ray.pipelines.events import audience_overlap

    users = ["u1", "u2", "u2", "u3", "u3", "u4", "u5"]
    types = ["purchase",                 # u1: a_only
             "purchase", "click",        # u2: both
             "click", "click",           # u3: b_only
             "view",                      # u4: neither
             "purchase"]                  # u5: a_only
    n = len(users)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array([np.datetime64("2020-01-01", "us")] * n,
                       pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(types),
        "value": pa.array([0.0] * n),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")

    got = _df(audience_overlap(str(tmp_path))).sort_values(
        "segment").reset_index(drop=True)
    assert list(got["segment"]) == ["a_only", "b_only", "both"]
    assert list(got["n_users"]) == [2, 1, 1]
