"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the *decode kernel* is stubbed:
``MediaDecoder`` uses a deterministic fake payload format (a small header +
the document text bytes) and raises ``NotImplementedError`` if a real codec
is requested.  Everything Ray-side is real and tested: binary column
schema, small-batch sizing for large payloads, actor signature, zero-copy
pass-through of the payload column, and the feature-table output layout.

Payload format (fake, deterministic from doc_id):
  bytes 0-3   magic  b"IMG0"
  bytes 4-5   width  uint16 LE  = 32 + doc_id % 608
  bytes 6-7   height uint16 LE  = 32 + (doc_id * 7) % 608
  bytes 8-    "pixel" bytes     = the document text, UTF-8
"""

from __future__ import annotations

import struct

import pyarrow as pa

MAGIC = b"IMG0"


def fake_media_dataset(sf_dir: str):
    """documents → (doc_id, payload: binary) — the binary-column source.

    Large-payload guidance: batch_size is kept small so
    batch × payload × concurrency fits the worker heap (the prompt-level
    rule for image/audio columns)."""
    from nativeextractor_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def pack(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        payload = [
            MAGIC
            + struct.pack("<HH", 32 + d % 608, 32 + (d * 7) % 608)
            + s.encode()
            for d, s in zip(ids, texts)
        ]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payload, pa.binary())})

    return ds.map_batches(pack, batch_format="pyarrow", batch_size=256)


class MediaDecoder:
    """Actor-pool decode stage.  ``codec="fake"`` parses the deterministic
    header; any real codec is a clearly-marked stub (no image libs in this
    container — the real implementation would do PIL/ffmpeg work here,
    loaded once per actor in ``__init__``)."""

    def __init__(self, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real decoders (PIL/ffmpeg) are not available "
                "in this environment; the fake codec exercises the same plumbing"
            )
        self.codec = codec

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        w_out, h_out, n_out = [], [], []
        for p in payloads:
            if p[:4] != MAGIC:
                raise ValueError("bad magic in media payload")
            w, h = struct.unpack("<HH", p[4:8])
            w_out.append(w)
            h_out.append(h)
            n_out.append(len(p) - 8)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "width": pa.array(w_out, pa.int64()),
            "height": pa.array(h_out, pa.int64()),
            "n_payload_bytes": pa.array(n_out, pa.int64()),
        })


def multimodal_features(sf_dir: str):
    """Full binary-column pipeline: pack → actor-pool decode → features."""
    ds = fake_media_dataset(sf_dir)
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"codec": "fake"},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# the fake payload is an analytic function of (doc_id, text), so the oracle
# recomputes the features without ever building the binary column
MULTIMODAL_FEATURES_SQL = """SELECT doc_id,
  CAST(32 + doc_id % 608 AS BIGINT) AS width,
  CAST(32 + (doc_id * 7) % 608 AS BIGINT) AS height,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_payload_bytes
FROM documents"""


def frame_sample_features(sf_dir: str, stride: int = 16):
    """Frame/sample extraction pattern: stride-sample the payload bytes and
    emit per-doc aggregate features.

    Oracle: the payload after the 8-byte header IS the document text
    (fake_media_dataset), so FRAME_SAMPLE_SQL strides over the text's
    bytes directly (byte == character on this corpus — every document is
    ASCII, asserted by tests/test_trainingdata.py)."""
    import numpy as np

    ds = fake_media_dataset(sf_dir)

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        n_out, mean_out = [], []
        for p in payloads:
            frames = np.frombuffer(p[8:], dtype=np.uint8)[::stride]
            n_out.append(int(frames.size))
            mean_out.append(int(frames.astype(np.int64).sum() // max(frames.size, 1)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(n_out, pa.int64()),
            "mean_byte": pa.array(mean_out, pa.int64()),
        })

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=256)


FRAME_SAMPLE_SQL = """SELECT doc_id,
  n_frames,
  CAST(CASE WHEN n_frames = 0 THEN 0 ELSE s // n_frames END AS BIGINT) AS mean_byte
FROM (
  SELECT doc_id,
    CAST(CASE WHEN length(text) = 0 THEN 0
         ELSE (length(text) - 1) // 16 + 1 END AS BIGINT) AS n_frames,
    coalesce(list_sum(list_transform(
      generate_series(1, length(text), 16), i -> ascii(substr(text, i, 1)))), 0) AS s
  FROM documents)"""


class MediaResizer:
    """Actor-pool binary→binary transform: the resize/downsample pattern.
    ``factor=f`` halves each header dimension (floor, min 1) and strides
    the pixel bytes f:1, emitting a NEW payload column — the shape a real
    thumbnail/re-encode stage has (PIL/ffmpeg would replace the kernel,
    loaded once per actor in ``__init__``)."""

    def __init__(self, factor: int = 2, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real resizers are not available here"
            )
        self.f = int(factor)

    def __call__(self, t: pa.Table) -> pa.Table:
        f = self.f
        out = []
        for p in t.column("payload").to_pylist():
            if p[:4] != MAGIC:
                raise ValueError("bad magic in media payload")
            w, h = struct.unpack("<HH", p[4:8])
            out.append(
                MAGIC + struct.pack("<HH", max(1, w // f), max(1, h // f))
                + p[8:][::f]
            )
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(out, pa.binary())})


def media_resize_features(sf_dir: str, factor: int = 2):
    """pack → actor-pool resize (binary→binary) → feature readout OF THE
    RESIZED payload (dims, byte count, byte sum) — the oracle recomputes
    the same features analytically, so a wrong byte in the transformed
    binary column shows up as a byte-sum mismatch."""
    import numpy as np

    ds = fake_media_dataset(sf_dir).map_batches(
        MediaResizer,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )

    def feats(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        w_out, h_out, n_out, s_out = [], [], [], []
        for p in t.column("payload").to_pylist():
            w, h = struct.unpack("<HH", p[4:8])
            body = np.frombuffer(p[8:], dtype=np.uint8)
            w_out.append(w)
            h_out.append(h)
            n_out.append(int(body.size))
            s_out.append(int(body.astype(np.int64).sum()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "width": pa.array(w_out, pa.int64()),
            "height": pa.array(h_out, pa.int64()),
            "n_payload_bytes": pa.array(n_out, pa.int64()),
            "byte_sum": pa.array(s_out, pa.int64()),
        })

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=256)


def media_resize_sql(factor: int = 2) -> str:
    f = int(factor)
    return f"""SELECT doc_id,
  CAST(greatest(1, (32 + doc_id % 608) // {f}) AS BIGINT) AS width,
  CAST(greatest(1, (32 + (doc_id * 7) % 608) // {f}) AS BIGINT) AS height,
  CAST(CASE WHEN length(text) = 0 THEN 0
       ELSE (length(text) - 1) // {f} + 1 END AS BIGINT) AS n_payload_bytes,
  CAST(coalesce(list_sum(list_transform(
    generate_series(1, length(text), {f}), i -> ascii(substr(text, i, 1)))), 0)
    AS BIGINT) AS byte_sum
FROM documents"""
