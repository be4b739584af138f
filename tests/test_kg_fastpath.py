"""batch_entities (joined-scan fast path) ≡ per-row turn_entities."""

import pyarrow.parquet as pq

from nativeextractor_ray.sources.transcripts import derive_transcripts_table
from nativeextractor_ray.stages.kg_extract import KgExtract


def test_batch_equals_per_row(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    batch = derive_transcripts_table(t)
    texts = batch.column("text").to_pylist()
    kg = KgExtract()
    fast = kg.batch_entities(texts)
    slow = [kg.turn_entities(x) for x in texts]
    assert fast == slow


def test_edge_rows():
    kg = KgExtract()
    texts = [
        "",                        # empty row
        "(erin went home",         # BOF non-space delimiter before dict word
        "visit https://a.b/c x",   # url at row start/end
        "mail x@y.zz +420123456789 on 2024-03-01 and 1.2.2024",
        "\n already has newline erin",  # internal newline
    ]
    fast = kg.batch_entities(texts)
    slow = [kg.turn_entities(x) for x in texts]
    assert fast == slow


def test_large_batch_slicing_combines_equal(sf_dir):
    """__call__ on one giant block ≡ per-slice calls after the downstream
    combine (the slice cap bounds transient memory, not semantics)."""
    import pandas as pd

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    batch = derive_transcripts_table(t)
    kg = KgExtract()

    def combined(out):
        df = out.to_pandas()
        return (df.groupby(["subj", "pred", "obj"], sort=True)
                .agg(support=("support", "sum"), first_seen=("first_seen", "min"),
                     prob=("prob", "max"), part=("part", "min"))
                .reset_index())

    whole = combined(kg(batch))
    kg.SLICE_ROWS = 37  # force many odd-sized slices
    sliced = combined(kg(batch))
    pd.testing.assert_frame_equal(whole, sliced)
