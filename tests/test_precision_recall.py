"""The BASELINE.json acceptance metric, computed directly: triple /
occurrence precision+recall vs the reference's own miner fixtures must be
≥ 0.95.

The per-case parity suites (test_glob_parity / test_enclosed /
test_regex_parity) already assert exact counts case by case; this test
aggregates the whole reference-fixture corpus into one micro-averaged P/R
figure over *span-level* predictions, then does the same end-to-end for
triples on the derived transcripts (our pipeline vs the independent DuckDB
oracle), so the ≥0.95 criterion is checked at both layers."""

import duckdb
import pyarrow.parquet as pq
import pytest

from nativeextractor_ray.miners.base import run_miners
from nativeextractor_ray.miners.glob import GlobMiner

from tests.test_glob_parity import CASES as GLOB_CASES


def test_span_level_pr_vs_reference_fixtures():
    """Micro-averaged occurrence P/R over every reference glob fixture
    (glob.c:233-309).  The reference asserts counts; our engine asserts the
    stronger span multiset, so predicted == expected ⇒ P = R = 1.0 ≥ 0.95."""
    tp = fp = fn = 0
    for text, glob, expected_count in GLOB_CASES:
        found = run_miners(text, [GlobMiner(glob)])
        n = len(found)
        # reference ground truth is the asserted count; span-accurate
        # engine output beyond the count is validated per-case elsewhere
        tp += min(n, expected_count)
        fp += max(0, n - expected_count)
        fn += max(0, expected_count - n)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    assert precision >= 0.95, f"P={precision:.3f}"
    assert recall >= 0.95, f"R={recall:.3f}"
    # in fact exact:
    assert precision == 1.0 and recall == 1.0


@pytest.fixture(scope="module")
def oracle_triples(sf_dir):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{sf_dir}/documents.parquet"))
    return {
        (r[0], r[1], r[2]): r[3]
        for r in con.sql(e.oracle_sql()["triples"]).fetchall()
    }


def test_triple_level_pr_vs_oracle(sf_dir, oracle_triples, ray_session):
    """End-to-end triple P/R of the Ray pipeline vs the independently
    rendered SQL oracle on the same input."""
    from nativeextractor_ray.pipelines.kg import triples_dataset

    got = {
        (r["subj"], r["pred"], r["obj"]): r["support"]
        for r in triples_dataset(sf_dir).take_all()
    }
    want = oracle_triples
    tp = sum(1 for k in got if k in want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    assert precision >= 0.95, f"P={precision:.3f}"
    assert recall >= 0.95, f"R={recall:.3f}"
    # support values must agree on the intersection
    mismatched = [k for k in got if k in want and got[k] != want[k]]
    assert not mismatched, mismatched[:5]
