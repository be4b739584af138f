"""Model-based quality classification over ``documents`` — the
fasttext-style quality-filter stage of an LLM training-data pipeline
(cf. the GPT-3 / DCLM quality classifiers): score every document with a
logistic model over cheap text features, emit the score and the keep
decision.

The model weights are deterministic literals (a trained classifier's
weights would arrive exactly the same way: a tiny broadcast constant —
the model is never part of the data motion).  Features are chosen so the
SQL oracle can replay them bit-for-bit from integer counts:

    x1 = ln(1 + n_tokens)          n_tokens = whitespace tokens
    x2 = stop_cnt / n_tokens       tokens in a fixed stopword set
    x3 = n_distinct / n_tokens     distinct-token ratio (lexical diversity)
    x4 = digit_cnt / n_chars       digit-character ratio
    z  = W0 + W1*x1 + W2*x2 + W3*x3 + W4*x4
    score = round(sigmoid(z), 6);  keep = score >= 0.5

Docs with zero tokens score 0.0 / keep 0 by definition (no 0/0).

Scale shape: pure streaming ``map_batches`` — no shuffle, no driver
state, nothing materializes.  Per batch everything is vectorized: one
Arrow ``split_pattern`` per batch, ``pandas.factorize`` for token codes,
``np.bincount`` for the per-doc reductions.  Reference economics: the
per-document feature pass mirrors the reference's single-pass miner scan
(``/root/reference/src/extractor.c:243-252`` — one cursor sweep per
batch, state compiled once per process).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: fixed stopword set — matches textstats.STOP_RE's word list
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

#: deterministic model weights (bias, ln-length, stopword ratio,
#: distinct ratio, digit ratio)
W = (-3.0, 0.55, 4.0, 2.2, -6.0)


def _docs(sf_dir: str):
    from nativeextractor_ray.sources.tables import read_table

    return read_table(sf_dir, "documents", ["doc_id", "text"])


def _classify_batch(t: pa.Table) -> pa.Table:
    txt = t.column("text")
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    digit_cnt = pc.count_substring_regex(txt, "[0-9]").to_numpy(
        zero_copy_only=False).astype(np.int64)

    toks = pc.split_pattern(txt, " ")
    parent = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    flat, parent = flat.filter(keep), parent.filter(keep)
    par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    words = flat.to_numpy(zero_copy_only=False)

    n = t.num_rows
    n_tokens = np.bincount(par, minlength=n).astype(np.int64)
    stop_mask = np.isin(words, np.array(STOPWORDS, dtype=object))
    stop_cnt = np.bincount(par, weights=stop_mask, minlength=n).astype(np.int64)
    # distinct tokens per doc: factorize to int codes (one C pass), then
    # unique (doc, code) pairs counted per doc
    codes = pd.factorize(words, sort=False)[0].astype(np.int64)
    ncodes = int(codes.max()) + 1 if len(codes) else 1
    pair = par * ncodes + codes
    upar = (np.unique(pair) // ncodes).astype(np.int64)
    n_distinct = np.bincount(upar, minlength=n).astype(np.int64)

    nt = n_tokens.astype(np.float64)
    nc = np.maximum(n_chars, 1).astype(np.float64)
    safe_nt = np.maximum(nt, 1.0)
    z = (W[0]
         + W[1] * np.log1p(nt)
         + W[2] * (stop_cnt / safe_nt)
         + W[3] * (n_distinct / safe_nt)
         + W[4] * (digit_cnt / nc))
    score = np.round(1.0 / (1.0 + np.exp(-z)), 6)
    score[n_tokens == 0] = 0.0
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_tokens": pa.array(n_tokens),
        "score": pa.array(score, pa.float64()),
        "keep": pa.array((score >= 0.5).astype(np.int64)),
    })


def quality_classifier(sf_dir: str):
    """(doc_id, n_tokens, score, keep) for every document."""
    return _docs(sf_dir).map_batches(_classify_batch, batch_format="pyarrow")


def quality_classifier_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(w)) AS n_distinct,
         len(list_filter(w, x -> x IN ({stop}))) AS stop_cnt,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt
  FROM w
),
scored AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0.0 ELSE
           round(1.0 / (1.0 + exp(-({W[0]}
             + {W[1]} * ln(1 + n_tokens)
             + {W[2]} * (stop_cnt / CAST(greatest(n_tokens, 1) AS DOUBLE))
             + {W[3]} * (n_distinct / CAST(greatest(n_tokens, 1) AS DOUBLE))
             + {W[4]} * (digit_cnt / CAST(greatest(n_chars, 1) AS DOUBLE))))), 6)
         END AS score
  FROM feat
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score,
       CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM scored"""
