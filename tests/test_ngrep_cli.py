"""ngrep CLI + text-corpus source parity (reference tests/glob.c and the
ngrep example drive the same file-scan path)."""

import pytest


@pytest.fixture()
def corpus(tmp_path):
    # the reference's canonical glob corpus (tests/glob.c:233-246)
    (tmp_path / "a.txt").write_text("abc abcdef abc")
    (tmp_path / "b.txt").write_text(
        "Twinkle twinkle little star How I wonder what you are "
        "Up above the world so high Like a diamond in the sky"
    )
    return tmp_path


def _run(capsys, argv):
    from nativeextractor_ray.ngrep import main

    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out
    return [l for l in out.splitlines() if l and not l.startswith("#")]


def test_corpus_source(corpus, ray_session):
    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset

    rows = text_corpus_dataset(str(corpus)).take_all()
    assert len(rows) == 2
    by_file = {r["conv_id"]: r["text"] for r in rows}
    assert any(t == "abc abcdef abc" for t in by_file.values())
    assert all(r["turn_idx"] == 0 for r in rows)


def test_ngrep_glob_counts(corpus, capsys, ray_session):
    # glob 'abc' over "abc abcdef abc" → 2 (tests/glob.c:235)
    lines = _run(capsys, ["-g", "abc", str(corpus / "a.txt")])
    assert len(lines) == 2
    # '*kle' over the verse → 2 (tests/glob.c:262)
    lines = _run(capsys, ["-g", "*kle", str(corpus / "b.txt")])
    assert len(lines) == 2


def test_ngrep_regex_json(corpus, capsys, ray_session):
    import json

    # regex attempts from every position (no token alignment,
    # regex_generator.c:1134-1154) → also hits inside "abcdef"
    lines = _run(capsys, ["-r", "abc", "--format", "json", str(corpus / "a.txt")])
    assert len(lines) == 3
    recs = [json.loads(l) for l in lines]
    assert {(r["pos"], r["len"]) for r in recs} == {(0, 3), (4, 3), (11, 3)}


def test_ngrep_dictionary(corpus, tmp_path, capsys, ray_session):
    dic = tmp_path / "dict.csv"
    dic.write_text("twinkle\nstar\n")
    lines = _run(capsys, ["-d", str(dic), str(corpus / "b.txt")])
    # twinkle ×4 (case-insensitive? NER prefix-ratio accepts 'Twinkle'
    # only if the trie is case-sensitive match — the dict stores
    # lowercase; 'Twinkle' shares 0 prefix bytes) + star ×2
    assert len(lines) >= 2
    assert any("star" in l for l in lines)


def test_ngrep_no_enclosed(corpus, capsys, ray_session):
    # regex 'abc' and glob 'abc abcdef abc' overlap; enclosed filter keeps
    # the longer span only (enclosed.c:181-209 semantics)
    all_lines = _run(capsys, ["-g", "abc", "-r", "abcdef", str(corpus / "a.txt")])
    filt = _run(capsys, ["-g", "abc", "-r", "abcdef", "--no-enclosed",
                         str(corpus / "a.txt")])
    assert len(filt) <= len(all_lines)
