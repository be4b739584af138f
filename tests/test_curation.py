"""Curation operators: PII redaction, repetition gate, stratified sampling.

Oracle parity for all four queries is covered by test_oracle_parity.py;
here we pin the semantic contracts that SQL cannot express:
- span-based redaction through the ACTUAL miner engine equals the
  vectorized RE2-chain path (so the fast path is anchored to the
  reference-faithful scanner, like the mentions fast-path guards);
- sampling is deterministic and respects per-stratum rates;
- the repetition gate passes exactly the rows its stats say it should.
"""

import numpy as np
import pyarrow as pa


def _transcript_rows(sf_dir, limit=None):
    import duckdb

    from nativeextractor_ray.sources.transcripts import TRANSCRIPTS_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    q = f"WITH t AS ({TRANSCRIPTS_SQL}) SELECT text FROM t ORDER BY conv_id, turn_idx"
    if limit:
        q += f" LIMIT {limit}"
    return [r[0] for r in con.execute(q).fetchall()]


def test_redact_matches_miner_spans(sf_dir):
    """Replacing the enclosed-filtered spans the miner engine finds must
    produce the same strings as the chained-RE2 vectorized path."""
    import nativeextractor_ray.miners as nm
    from nativeextractor_ray.pipelines.curation import redact_batch

    texts = _transcript_rows(sf_dir)
    miners = [nm.make_miner(n) for n in ("url", "email", "phone", "date")]
    token = {"Url": "[URL]", "Email": "[EMAIL]", "Phone": "[PHONE]", "Date": "[DATE]"}

    got_txt, got_n = redact_batch(pa.array(texts, pa.string()))
    got_txt = got_txt.to_pylist()
    got_n = got_n.to_pylist()

    n_checked = 0
    for text, fast, n_fast in zip(texts, got_txt, got_n):
        spans = [m for m in nm.run_miners(text, miners) if m.label in token]
        spans.sort(key=lambda m: m.upos)
        out, cur = [], 0
        for m in spans:
            out.append(text[cur:m.upos])
            out.append(token[m.label])
            cur = m.upos + m.ulen
        out.append(text[cur:])
        assert "".join(out) == fast
        assert len(spans) == n_fast
        n_checked += len(spans)
    assert n_checked > 0  # the corpus must actually exercise redaction


def test_sample_stratified_rates(sf_dir, ray_session):
    from nativeextractor_ray.pipelines.curation import (
        SAMPLE_RATES, sample_stratified,
    )

    rows = sample_stratified(sf_dir).take_all()
    assert rows
    for r in rows:
        assert r["bucket"] < SAMPLE_RATES.get(r["lang"], 100)
    # deterministic: second run identical
    rows2 = sample_stratified(sf_dir).take_all()
    key = lambda r: (r["doc_id"], r["lang"], r["bucket"])
    assert sorted(map(key, rows)) == sorted(map(key, rows2))
    # the en stratum is actually downsampled relative to the tail strata
    langs = [r["lang"] for r in rows]
    assert 0 < langs.count("en") < len(langs)


def test_repetition_gate_consistency(sf_dir, ray_session):
    from nativeextractor_ray.pipelines.curation import (
        REP_MAX_WORD_FRAC, documents_repetition_filtered, repetition_stats,
    )

    stats = {r["doc_id"]: r for r in repetition_stats(sf_dir).take_all()}
    kept = {r["doc_id"] for r in documents_repetition_filtered(sf_dir).take_all()}
    expect = {
        d for d, r in stats.items()
        if r["max_word_count"] * REP_MAX_WORD_FRAC <= r["n_words"]
    }
    assert kept == expect
    assert 0 < len(kept) < len(stats)  # the gate is non-trivial on this corpus


def test_pack_sequences_is_exact_prefix_sum(sf_dir, ray_session):
    """The two-pass distributed scan must equal a sequential scan: for
    docs in doc_id order, each doc's global token offset is the sum of
    all earlier docs' counts, and (seq_id, offset_in_seq) is that offset
    div/mod the budget."""
    from nativeextractor_ray.pipelines.curation import PACK_BUDGET, pack_sequences

    rows = sorted(pack_sequences(sf_dir).take_all(), key=lambda r: r["doc_id"])
    assert rows
    acc = 0
    for r in rows:
        assert r["seq_id"] == acc // PACK_BUDGET
        assert r["offset_in_seq"] == acc % PACK_BUDGET
        assert 0 <= r["offset_in_seq"] < PACK_BUDGET
        acc += r["n_tokens"]
    assert acc > PACK_BUDGET  # corpus spans multiple sequences


def test_repetition_stats_hand_checked():
    from nativeextractor_ray.pipelines.curation import _rep_stats_arrays

    txt = pa.array([
        "a b a\na b a",      # words: a×4 b×2; lines dup
        "",                   # empty: 0 words, 1 line
        "x",                  # 1 word
    ])
    got = _rep_stats_arrays(txt)
    assert got["n_words"].tolist() == [6, 0, 1]
    assert got["n_distinct_words"].tolist() == [2, 0, 1]
    assert got["max_word_count"].tolist() == [4, 0, 1]
    assert got["n_lines"].tolist() == [2, 1, 1]
    assert got["n_distinct_lines"].tolist() == [1, 1, 1]


def test_curation_e2e_composition(sf_dir, ray_session):
    """The composite must equal its stages composed by hand: survivors
    are exactly (token gate ∩ cluster keep), text is the redaction of the
    raw text, and packing offsets are the prefix sum over survivors."""
    from nativeextractor_ray.pipelines.curation import (
        E2E_MIN_TOKENS, PACK_BUDGET, curation_e2e, redact_batch,
    )
    from nativeextractor_ray.pipelines.dedup import dedup_clusters
    from nativeextractor_ray.sources.tables import read_table

    keep = {r["doc_id"] for r in dedup_clusters(sf_dir).take_all() if r["keep"]}
    raw = {r["doc_id"]: r["text"]
           for r in read_table(sf_dir, "documents", ["doc_id", "text"]).take_all()}
    got = sorted(curation_e2e(sf_dir).take_all(), key=lambda r: r["doc_id"])

    expect_ids = sorted(
        d for d, txt in raw.items()
        if d in keep and len(txt.split()) >= E2E_MIN_TOKENS
    )
    assert [r["doc_id"] for r in got] == expect_ids
    assert len(expect_ids) < len(raw)  # both gates actually fire

    acc = 0
    for r in got:
        red = redact_batch(pa.array([raw[r["doc_id"]]]))[0].to_pylist()[0]
        assert r["text_redacted"] == red
        assert r["n_tokens"] == len(red.split())
        assert r["seq_id"] == acc // PACK_BUDGET
        assert r["offset_in_seq"] == acc % PACK_BUDGET
        acc += r["n_tokens"]
