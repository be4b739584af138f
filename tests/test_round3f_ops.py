"""Planted-fixture tests for the round-3f operators (triangle counting
is covered in test_graph.py): lexical_diversity's exact half-up TTR,
term_freq_histogram's count-of-counts across batch boundaries, the Q4
EXISTS collapse (max-shipdate vs orderdate), and the rolling-window /
growth-curve ops are in test_windows_ops.py."""

import numpy as np
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


def _docs(tmp_path, texts: list[str]) -> str:
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")
    return str(tmp_path)


def test_lexical_diversity_planted(ray_session, tmp_path):
    from nativeextractor_ray.pipelines.textstats import lexical_diversity

    sf = _docs(tmp_path, [
        "a b c",          # 3/3 -> 1_000_000
        "a a a",          # 1/3 -> (2e6+3)//6 = 333333 (half-up of 333333.3)
        "x y x",          # 2/3 -> (4e6+3)//6 = 666667 (half-up of 666666.7)
        "  a   b  ",      # empties dropped: 2 tokens 2 distinct
        "",               # zero tokens: excluded
    ])
    got = _df(lexical_diversity(sf)).sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [1, 2, 3, 4]
    assert list(got["n_tokens"]) == [3, 3, 3, 2]
    assert list(got["n_distinct"]) == [3, 1, 2, 2]
    assert list(got["ttr_micro"]) == [1_000_000, 333333, 666667, 1_000_000]


def test_term_freq_histogram_planted(ray_session, tmp_path):
    """Term counts must merge ACROSS documents (and hence across batch
    partials) before the count-of-counts."""
    from nativeextractor_ray.pipelines.textstats import term_freq_histogram

    sf = _docs(tmp_path, [
        "apple apple banana",
        "apple cherry banana",
        "durian",
    ])
    # tf: apple=3, banana=2, cherry=1, durian=1 -> freq 1:2 terms, 2:1, 3:1
    got = _df(term_freq_histogram(sf)).sort_values("freq").reset_index(drop=True)
    assert list(got["freq"]) == [1, 2, 3]
    assert list(got["n_terms"]) == [2, 1, 1]


def test_late_shipment_priority_planted(ray_session, tmp_path):
    """EXISTS collapse edge cases: ship == orderdate does NOT count,
    multiple late lineitems count the order ONCE, lineitem-less orders
    never count."""
    from nativeextractor_ray.pipelines.relational import late_shipment_priority

    d = lambda s: np.datetime64(s, "D")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4),
        "o_totalprice": pa.array([1.0] * 4),
        "o_orderdate": pa.array(
            np.array([d("2024-01-10")] * 4, dtype="datetime64[D]")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "2-HIGH", "2-HIGH"]),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 4, pa.int64()),
        "l_suppkey": pa.array([1] * 4, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 4),
        "l_extendedprice": pa.array([1.0] * 4),
        "l_discount": pa.array([0.0] * 4),
        "l_tax": pa.array([0.0] * 4),
        "l_returnflag": pa.array(["N"] * 4),
        "l_linestatus": pa.array(["O"] * 4),
        # order 1: two LATE lineitems (counted once); order 2: ship ==
        # orderdate (NOT late); order 3: late; order 4: no lineitems
        "l_shipdate": pa.array(np.array(
            [d("2024-01-11"), d("2024-02-01"),
             d("2024-01-10"), d("2024-01-20")], dtype="datetime64[D]")),
    }), tmp_path / "lineitem.parquet")

    got = _df(late_shipment_priority(str(tmp_path))).sort_values(
        "o_orderpriority").reset_index(drop=True)
    assert list(got["o_orderpriority"]) == ["1-URGENT", "2-HIGH"]
    assert list(got["n_orders"]) == [1, 1]


def test_late_event_stats_planted(ray_session, tmp_path):
    """event_id is the arrival order: user 1 arrives ts 100, 50, 200,
    150 -> two late events (lateness 50 each); user 2 in order; a
    single-event user contributes no lateness."""
    from nativeextractor_ray.pipelines.windows import late_event_stats

    rows = [
        # (event_id, user_id, ts_us, type)
        (1, 1, 100, "a"), (2, 1, 50, "a"), (3, 1, 200, "b"),
        (4, 1, 150, "b"),
        (5, 2, 10, "a"), (6, 2, 20, "a"),
        (7, 3, 999, "b"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")

    got = _df(late_event_stats(str(tmp_path))).sort_values(
        "event_type").reset_index(drop=True)
    assert list(got["event_type"]) == ["a", "b"]
    assert list(got["n_events"]) == [4, 3]
    assert list(got["n_late"]) == [1, 1]
    assert list(got["max_lateness_us"]) == [50, 50]


def test_promo_revenue_share_planted(ray_session, tmp_path):
    """Known-ratio months incl. a half-up rounding boundary and a month
    with zero promo revenue."""
    from nativeextractor_ray.pipelines.relational import promo_revenue_share

    d = lambda s: np.datetime64(s, "D")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["x", "y"]),
        "p_brand": pa.array(["B", "B"]),
        "p_type": pa.array(["PROMO", "STANDARD"]),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0]),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 3),
        # Jan: promo 1.00, standard 2.00 -> share 100/300 = 333333.33
        # -> half-up micro 333333; Feb: no promo -> 0
        "l_extendedprice": pa.array([1.0, 2.0, 5.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": pa.array(["N"] * 3),
        "l_linestatus": pa.array(["O"] * 3),
        "l_shipdate": pa.array(np.array(
            [d("2024-01-05"), d("2024-01-20"), d("2024-02-01")],
            dtype="datetime64[D]")),
    }), tmp_path / "lineitem.parquet")

    got = _df(promo_revenue_share(str(tmp_path))).sort_values(
        "month").reset_index(drop=True)
    assert list(got["month"]) == ["2024-01", "2024-02"]
    assert list(got["promo_rev_c"]) == [100, 0]
    assert list(got["total_rev_c"]) == [300, 500]
    assert list(got["promo_share_micro"]) == [333333, 0]


def test_winsorized_value_mean_planted(ray_session, tmp_path):
    """20 values per type: the p05/p95 clip (ranks ceil(.05*20)=1,
    ceil(.95*20)=19) must tame one huge outlier; hand-computed mean."""
    from nativeextractor_ray.pipelines.quantiles import winsorized_value_mean

    vals = list(range(1, 20)) + [10_000]  # 1..19 then an outlier
    rows = [(i + 1, 1, 1000 + i, "a", float(v)) for i, v in enumerate(vals)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), tmp_path / "events.parquet")

    got = _df(winsorized_value_mean(str(tmp_path))).reset_index(drop=True)
    assert list(got["event_type"]) == ["a"]
    assert list(got["n"]) == [20]
    # clip bounds: lo = value at rank 1 = 1, hi = value at rank 19 = 19
    # -> the outlier clips to 19; sum = (1..19) + 19 = 190 + 19 = 209
    assert list(got["sum_clipped_c"]) == [20900]
    # mean = 209/20 = 10.45 -> 1045 cents-micro*? mean_micro_c =
    # half-up(20900/20 * 1e6 / 1e0) = 20900*1e6/20 = 1_045_000_000
    assert list(got["mean_micro_c"]) == [1_045_000_000]


def test_lang_confusion_planted(ray_session, tmp_path):
    """Declared tags disagree with the marker argmax: an 'en'-tagged
    German text lands in (en, de); no markers -> 'und'."""
    from nativeextractor_ray.pipelines.textstats import lang_confusion

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the cat and the dog is of note",   # en -> en
            "der hund und die katze ist da",    # en-tagged, de-predicted
            "xyz qqq zzz",                      # no markers -> und
            "el perro y los gatos es grande",   # es -> es
        ]),
        "lang": pa.array(["en", "en", "en", "es"]),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([30] * 4, pa.int64()),
    }), tmp_path / "documents.parquet")

    got = _df(lang_confusion(str(tmp_path))).sort_values(
        ["lang", "pred_lang"]).reset_index(drop=True)
    want = {("en", "en"): 1, ("en", "de"): 1, ("en", "und"): 1,
            ("es", "es"): 1}
    assert dict(zip(zip(got["lang"], got["pred_lang"]),
                    got["n_docs"])) == want


def test_turn_role_transitions_planted(ray_session, tmp_path):
    """Hand-planted conversations via a mocked transcripts source: a
    user→assistant→tool→assistant conv and a single-turn conv (no
    transitions); turn order by turn_idx, not row order."""
    import unittest.mock as mock

    import ray
    import ray.data

    from nativeextractor_ray.pipelines import kg

    tbl = pa.table({
        "conv_id": pa.array(["c1", "c1", "c1", "c1", "c2"]),
        # rows deliberately out of turn order
        "turn_idx": pa.array([2, 0, 1, 3, 0], pa.int32()),
        "role": pa.array(["tool", "user", "assistant", "assistant", "user"]),
        "text": pa.array(["x"] * 5),
        "tool": pa.array([""] * 5),
        "ts": pa.array([0] * 5, pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(tbl)
    with mock.patch.object(kg, "transcripts_dataset", lambda sf: ds):
        got = _df(kg.turn_role_transitions("unused"))
    want = {("user", "assistant"): 1, ("assistant", "tool"): 1,
            ("tool", "assistant"): 1}
    assert dict(zip(zip(got["from_role"], got["to_role"]), got["n"])) == want


def test_dup_rate_by_source_planted(ray_session, tmp_path):
    """Cross-source copies charge the COPIER: source A publishes first
    (doc 1), B copies it twice (docs 3, 5); B also has a unique doc and
    an intra-B dup pair."""
    from nativeextractor_ray.pipelines.dedup import dup_rate_by_source

    texts = ["orig", "b unique", "orig", "b pair", "orig", "b pair"]
    srcs = ["A", "B", "B", "B", "B", "B"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 7), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")

    got = _df(dup_rate_by_source(str(tmp_path))).sort_values(
        "source").reset_index(drop=True)
    assert list(got["source"]) == ["A", "B"]
    assert list(got["n_docs"]) == [1, 5]
    # B's dups: docs 3, 5 (copies of A's doc 1) + doc 6 (copy of doc 4)
    assert list(got["n_dups"]) == [0, 3]


def test_source_concentration_planted(ray_session, tmp_path):
    """Two sources 3:1 -> HHI = (3/4)^2 + (1/4)^2 = 0.625, top share
    0.75 — exact micro integers."""
    from nativeextractor_ray.pipelines.audit import source_concentration

    texts = ["a", "b", "c", "d"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 5), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["A", "A", "A", "B"]),
        "n_chars": pa.array([1] * 4, pa.int64()),
    }), tmp_path / "documents.parquet")

    got = _df(source_concentration(str(tmp_path)))
    assert list(got["n_sources"]) == [2]
    assert list(got["n_docs"]) == [4]
    assert list(got["hhi_micro"]) == [625_000]
    assert list(got["top_share_micro"]) == [750_000]


def test_events_minute_rate_gap_fill(ray_session, tmp_path):
    """Minutes with no events appear zero-filled between first and last."""
    from nativeextractor_ray.pipelines.events import events_minute_rate

    m = 60_000_000
    ts = [10, 20, 3 * m + 5]  # minute 0 (x2), minutes 1-2 empty, minute 3
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([0.0] * 3),
        "props": pa.array(["{}"] * 3),
    }), tmp_path / "events.parquet")

    got = _df(events_minute_rate(str(tmp_path))).reset_index(drop=True)
    assert len(got) == 4
    assert list(got["n_events"]) == [2, 0, 0, 1]
    mins = got["minute"].astype("datetime64[us]").astype(np.int64)
    assert list(mins) == [0, m, 2 * m, 3 * m]


def test_conv_length_histogram_planted(ray_session, tmp_path):
    """Lengths must merge ACROSS batches before the count-of-counts."""
    import unittest.mock as mock

    import ray
    import ray.data

    from nativeextractor_ray.pipelines import kg

    tbl = pa.table({
        "conv_id": pa.array(["a"] * 3 + ["b"] * 3 + ["c"] * 2 + ["d"]),
        "turn_idx": pa.array([0, 1, 2, 0, 1, 2, 0, 1, 0], pa.int32()),
        "role": pa.array(["user"] * 9),
        "text": pa.array(["x"] * 9),
        "tool": pa.array([""] * 9),
        "ts": pa.array([0] * 9, pa.timestamp("us")),
    })
    # two single-row blocks force cross-batch length merging for conv a/b
    ds = ray.data.from_arrow([tbl.slice(0, 5), tbl.slice(5)])
    with mock.patch.object(kg, "transcripts_dataset", lambda sf: ds):
        got = _df(kg.conv_length_histogram("unused"))
    want = {3: 2, 2: 1, 1: 1}  # a,b -> 3 turns; c -> 2; d -> 1
    assert dict(zip(got["n_turns"], got["n_convs"])) == want


def test_value_mad_by_type_planted(ray_session, tmp_path):
    """Hand-computed MAD: values 1..5 + outlier 100 -> median is the
    rank-3 value 3, absdevs {2,1,0,1,2,97} -> MAD = rank-3 of sorted
    absdevs {0,1,1,2,2,97} = 1."""
    from nativeextractor_ray.pipelines.quantiles import value_mad_by_type

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, 7), pa.int64()),
        "ts": pa.array(range(6), pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 6),
    }), tmp_path / "events.parquet")

    got = _df(value_mad_by_type(str(tmp_path)))
    assert list(got["event_type"]) == ["a"]
    assert list(got["median"]) == [3.0]
    assert list(got["mad"]) == [1.0]


def test_first_response_latency_planted(ray_session, tmp_path):
    """Assistant-opens gives negative latency; missing-role convs drop;
    cross-batch min merging via two blocks."""
    import unittest.mock as mock

    import ray
    import ray.data

    from nativeextractor_ray.pipelines import kg

    tbl = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b", "c"]),
        "turn_idx": pa.array([0, 1, 2, 0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user",
                          "assistant", "user", "user"]),
        "text": pa.array(["x"] * 6),
        "tool": pa.array([""] * 6),
        "ts": pa.array([100, 250, 400, 500, 900, 7], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow([tbl.slice(0, 2), tbl.slice(2)])
    with mock.patch.object(kg, "transcripts_dataset", lambda sf: ds):
        got = _df(kg.first_response_latency("unused"))
    want = {"a": 150, "b": -400}  # c has no assistant -> excluded
    assert dict(zip(got["conv_id"], got["latency_us"])) == want


def test_tool_call_stats_planted(ray_session, tmp_path):
    """Distinct-conv counting across batches; empty tool rows excluded."""
    import unittest.mock as mock

    import ray
    import ray.data

    from nativeextractor_ray.pipelines import kg

    tbl = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b", "c"]),
        "turn_idx": pa.array([0, 1, 2, 0, 1, 0], pa.int32()),
        "role": pa.array(["user"] * 6),
        "text": pa.array(["x"] * 6),
        "tool": pa.array(["search", "search", "", "search", "code", ""]),
        "ts": pa.array([0] * 6, pa.timestamp("us")),
    })
    ds = ray.data.from_arrow([tbl.slice(0, 2), tbl.slice(2)])
    with mock.patch.object(kg, "transcripts_dataset", lambda sf: ds):
        got = _df(kg.tool_call_stats("unused"))
    rows = {t: (nt, nc) for t, nt, nc in
            zip(got["tool"], got["n_turns"], got["n_convs"])}
    assert rows == {"search": (3, 2), "code": (1, 1)}
