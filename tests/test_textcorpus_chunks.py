"""Chunked giant-file source: whole-file scan and chunked scan must yield
the IDENTICAL mention multiset in global byte coordinates
(``chunk_offset + pos``) — the Ray-native rendering of the reference's
cross-batch ``last_max`` paging (extractor.c:69-76; tests/enclosed.c:241
batch=1 stress is the behavioral model).
"""

import random

import pytest

CHUNK = 64 << 10  # 64 KiB chunks for the test file
OVERLAP = 512


def _synth_text(n_lines=4000, seed=11):
    """Realistic mixed corpus: emails, URLs, dates, phones, dict words,
    long lines and short lines, so chunk cuts land mid-everything."""
    rng = random.Random(seed)
    words = ("alpha beta gamma delta kontakt praha server tensor "
             "novak procurement invoice").split()
    lines = []
    for i in range(n_lines):
        parts = [rng.choice(words) for _ in range(rng.randrange(2, 14))]
        if i % 7 == 0:
            parts.append(f"user{i}@example.com")
        if i % 11 == 0:
            parts.append(f"https://example.org/p/{i}")
        if i % 13 == 0:
            parts.append(f"{1900 + i % 100}-{1 + i % 12:02d}-{1 + i % 28:02d}")
        if i % 17 == 0:
            parts.append("+420 601 123 456")
        lines.append(" ".join(parts))
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "big.txt"
    p.write_text(_synth_text(), encoding="utf-8")
    return str(p)


def _mentions(ds):
    from nativeextractor_ray.stages.miner_pool import (
        STD_MINER_SPECS, MinerPool,
    )

    out = ds.map_batches(
        MinerPool,
        fn_constructor_args=(tuple(STD_MINER_SPECS),),
        fn_constructor_kwargs={"no_enclosed": True,
                               "carry": ("chunk_offset",)},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 2),
    )
    return sorted(
        (r["chunk_offset"] + r["pos"], r["len"], r["surface"], r["label"])
        for r in out.take_all()
    )


def test_chunked_equals_whole(corpus_file, ray_session):
    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset

    whole = text_corpus_dataset(corpus_file, chunk_bytes=None)
    assert whole.count() == 1
    chunked = text_corpus_dataset(
        corpus_file, chunk_bytes=CHUNK, overlap_bytes=OVERLAP)
    n_chunks = chunked.count()
    assert n_chunks > 3  # the file must actually split

    got_whole = _mentions(whole)
    got_chunked = _mentions(_reload(corpus_file))
    assert got_whole == got_chunked
    assert len(got_whole) > 500  # the corpus must exercise every miner


def _reload(corpus_file):
    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset

    return text_corpus_dataset(
        corpus_file, chunk_bytes=CHUNK, overlap_bytes=OVERLAP)


def test_chunks_tile_exactly(corpus_file, ray_session):
    """Chunk texts concatenated in chunk_idx order must reproduce the file
    byte-for-byte (no gap, no overlap survives into the rows)."""
    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset

    rows = sorted(
        text_corpus_dataset(
            corpus_file, chunk_bytes=CHUNK, overlap_bytes=OVERLAP).take_all(),
        key=lambda r: r["turn_idx"],
    )
    whole = open(corpus_file, encoding="utf-8").read()
    assert "".join(r["text"] for r in rows) == whole
    # offsets are consistent: each chunk starts where the text says it does
    for r in rows:
        off = r["chunk_offset"]
        frag = r["text"][:50].encode()
        assert whole.encode()[off:off + len(frag)] == frag


def test_small_files_unsplit(tmp_path, ray_session):
    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset

    f = tmp_path / "small.txt"
    f.write_text("kontakt a@b.cz\n", encoding="utf-8")
    rows = text_corpus_dataset(str(f)).take_all()
    assert len(rows) == 1
    assert rows[0]["chunk_offset"] == 0 and rows[0]["turn_idx"] == 0
