"""lm_score: broadcast vs shuffle-attach path equality; oracle parity at
sf0.001 is covered by test_oracle_parity.py."""

import pandas as pd
import pyarrow as pa
import pytest

from nativeextractor_ray.pipelines import lmscore


def _collect(res) -> pd.DataFrame:
    import ray

    parts = [ray.get(r) for r in res.to_arrow_refs()]
    df = pa.concat_tables([p for p in parts if p.num_rows]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_paths_agree(sf_dir, ray_session, monkeypatch):
    broadcast = _collect(lmscore.lm_score(sf_dir))
    monkeypatch.setattr(lmscore, "MODEL_BROADCAST_BOUND", 0)
    attached = _collect(lmscore.lm_score(sf_dir))
    assert list(broadcast.columns) == list(attached.columns)
    # float-sum order differs between the paths (per-position vs
    # m*ln(...) per distinct key) — equality to rounding tolerance
    pd.testing.assert_frame_equal(broadcast, attached,
                                  check_exact=False, rtol=1e-5, atol=2e-6)


def test_zero_bigram_docs_present(sf_dir, ray_session):
    out = _collect(lmscore.lm_score(sf_dir))
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert len(out) == n_docs
    assert (out.loc[out["n_bigrams"] == 0, "lm_logprob"] == 0.0).all()
    # scores are log-probabilities: strictly negative when bigrams exist
    assert (out.loc[out["n_bigrams"] > 0, "lm_logprob"] < 0).all()
