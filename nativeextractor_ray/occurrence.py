"""Occurrence/mention record and the engine's Arrow schemas.

The reference's single output record is ``occurrence_t {char* str; uint64
pos; uint64 upos; uint32 len; uint32 ulen; const char* label; float prob}``
(``/root/reference/include/nativeextractor/occurrence.h:21-29``): ``pos/len``
are byte offsets/lengths into the stream, ``upos/ulen`` codepoint
offsets/lengths, ``label`` the miner name, ``prob`` a confidence.

Here the unit of text is one transcript turn (a row), so every mention also
carries the turn key ``(conv_id, turn_idx)``.
"""

from __future__ import annotations

from typing import NamedTuple

import pyarrow as pa


class Mention(NamedTuple):
    """One occurrence within a single text (byte + codepoint span)."""

    label: str
    pos: int        # byte offset        (occurrence.h:23)
    upos: int       # codepoint offset   (occurrence.h:24)
    len: int        # byte length        (occurrence.h:25)
    ulen: int       # codepoint length   (occurrence.h:26)
    surface: str    # text[upos:upos+ulen]
    prob: float


TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("label", pa.string()),
        ("pos", pa.int64()),
        ("upos", pa.int64()),
        ("len", pa.int32()),
        ("ulen", pa.int32()),
        ("surface", pa.string()),
        ("prob", pa.float32()),
    ]
)

ENTITIES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical", pa.string()),
        ("label", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("prob", pa.float32()),
        ("support", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)
