"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.14): image/audio/video travel as ``binary``
columns with typed metadata alongside; decode / feature-extract runs
as Arrow-batched ``mapInPandas`` so each Python worker processes a
whole columnar batch (the only sane way to touch Python from a
100 TB scan). Partitioning guidance: binary payloads dominate row
size — keep ``spark.sql.files.maxPartitionBytes`` at the default
128 MB so scan tasks stay memory-bounded, and NEVER collect payloads.

The real decoders (PIL/ffmpeg/etc.) are NOT in this container, so
``decode_image`` is an explicitly-marked stub; ``fake_decode_meta``
is the deterministic stand-in the oracle-checked query uses — the
Spark-side plumbing (schema, Arrow batching, UDF signature) is real
and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the decoded-metadata record batch
DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("fake_n_frames", T.IntegerType()),
    ]
)


def binary_payload(text: Column | str) -> Column:
    """Opaque binary column (fixture stand-in: utf-8 bytes of text;
    in production this is the raw image/audio blob)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.encode(c, "utf-8")


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB — real image decoding requires PIL/libjpeg, absent from
    this container. The Arrow plumbing around it (fake_decode_meta)
    is real; swap this in when a decoder is available."""
    raise NotImplementedError(
        "image decoding not available in this environment; "
        "use fake_decode_meta for the deterministic test path"
    )


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """Deterministic 'decode': byte length, first byte, fake dims
    derived from the payload — exercises the exact mapInPandas shape a
    real decoder uses (binary in, typed struct out, Arrow batches)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            byte_len = payload.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": byte_len,
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "fake_width": (64 + byte_len % 512).astype("int32"),
                    "fake_height": (64 + byte_len % 384).astype("int32"),
                    "fake_n_frames": (1 + byte_len % 7).astype("int32"),
                }
            )

    return df.mapInPandas(_decode, DECODED_META_SCHEMA)
