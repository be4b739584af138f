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
