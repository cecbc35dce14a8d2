"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` (the one place
Python in the row path is the right call — real decoders are C
libraries reached from pandas batches, never per-row Python loops).

The sandbox has no image/audio libraries, so the *decode* step is a
deterministic fake (md5-derived dimensions) — clearly marked, with the
real-codec entry point stubbed behind ``NotImplementedError`` — while
everything Spark-side is real and tested: the binary payload column,
the mapInPandas schema/batch contract, even-spaced frame sampling, and
the partitioning story (payload bytes stay columnar Arrow buffers; no
driver collect).

Because the fake decode is pure md5 arithmetic, the DuckDB oracle can
replay it exactly — so even the pandas-UDF path sits behind the
driver's value-hash correctness gate.

At scale: decode cost dominates, so the plan is scan -> mapInPandas
(pipelined, no shuffle) -> write; ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds batch memory for fat payloads; payload
columns are pruned away before any shuffle/agg stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import load_table as T_
from .util import spread

N_SAMPLED = 4

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        # comma-joined string, not array<int>: the driver's pandas
        # canonicalizer sorts rows over all columns and Python lists
        # are unhashable (round-1 red row) — a scalar keeps the
        # contract checkable and the values identical
        T.StructField("sampled_frames", T.StringType()),
    ]
)


def decode_frames(payload: bytes) -> list[bytes]:
    """PIXEL/SAMPLE decode entry point (ffmpeg/PIL territory). STUB:
    the container ships no codecs; wire a real decoder here on a
    cluster image that has one. Container-level METADATA, by contrast,
    is real — see :func:`decode_media_meta`."""
    raise NotImplementedError("no image/audio codecs in this environment")


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_media_meta(payload: bytes) -> dict:
    """REAL container parsing, no codec library needed: PNG (IHDR),
    GIF (logical screen descriptor + a block walk counting image
    descriptors — animated GIFs report their true frame count), WAV
    (RIFF, via the stdlib ``wave`` module). This is the part of the
    r4 'real codecs missing' gap the standard library can close;
    entropy-coded pixel/sample decode (JPEG, MP4, ...) remains the
    documented external plug point (:func:`decode_frames`). Raises
    NotImplementedError for unrecognized containers — loud, never a
    guessed answer."""
    import io
    import struct
    import wave as wave_mod

    if payload[:8] == PNG_MAGIC:
        if payload[12:16] != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        width, height = struct.unpack(">II", payload[16:24])
        return {
            "kind": "png",
            "width": int(width),
            "height": int(height),
            "n_frames": 1,
            "sample_rate": None,
            "n_channels": None,
        }
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack("<HH", payload[6:10])
        packed = payload[10]
        pos = 13
        if packed & 0x80:  # global color table
            pos += 3 * (2 << (packed & 0x07))
        frames = 0
        while pos < len(payload):
            introducer = payload[pos]
            pos += 1
            if introducer == 0x3B:  # trailer
                break
            if introducer == 0x21:  # extension: label + sub-blocks
                pos += 1
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif introducer == 0x2C:  # image descriptor
                frames += 1
                lpacked = payload[pos + 8]
                pos += 9
                if lpacked & 0x80:  # local color table
                    pos += 3 * (2 << (lpacked & 0x07))
                pos += 1  # LZW minimum code size
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            else:
                raise ValueError(f"GIF: unknown block 0x{introducer:02x}")
        return {
            "kind": "gif",
            "width": int(width),
            "height": int(height),
            "n_frames": frames,
            "sample_rate": None,
            "n_channels": None,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave_mod.open(io.BytesIO(payload)) as wf:
            return {
                "kind": "wav",
                "width": None,
                "height": None,
                "n_frames": int(wf.getnframes()),
                "sample_rate": int(wf.getframerate()),
                "n_channels": int(wf.getnchannels()),
            }
    raise NotImplementedError(
        "unrecognized media container; wire a real codec (ffmpeg/PIL) in decode_frames"
    )


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> REAL decoded container metadata,
    Arrow-batched. Same plan shape as multimodal_meta: scan ->
    mapInPandas, pipelined, no shuffle; payload pruned after this
    stage. Not driver-oracle-paired (DuckDB cannot parse PNG/GIF/WAV);
    pinned by tests/test_multimodal_real.py against hand-built real
    files."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_media_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{
                        k: [r[k] for r in rows]
                        for k in (
                            "kind",
                            "width",
                            "height",
                            "n_frames",
                            "sample_rate",
                            "n_channels",
                        )
                    },
                }
            )

    return media.mapInPandas(run, MEDIA_META_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for decode: md5-derived dimensions.
    Mirrored 1:1 by the DuckDB oracle SQL below."""
    digest = hashlib.md5(payload).hexdigest()
    width = 16 + int(digest[0:2], 16) % 240
    height = 16 + int(digest[2:4], 16) % 240
    n_frames = 1 + int(digest[4:6], 16) % 30
    return digest, width, height, n_frames


def _sample_indices(n_frames: int, k: int = N_SAMPLED) -> list[int]:
    """Evenly spaced frame indices, endpoints included."""
    if n_frames <= 1:
        return [0] * k
    return [(j * (n_frames - 1)) // (k - 1) for j in range(k)]


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        meta = [_fake_decode(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(p) for p in payloads],
                "digest": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "n_frames": [m[3] for m in meta],
                "sampled_frames": [
                    ",".join(str(i) for i in _sample_indices(m[3])) for m in meta
                ],
            }
        )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column. In production this IS the
    stored image/audio bytes; here the utf-8 text bytes stand in, so
    metadata is verifiable downstream."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    # documents is one input split on disk; per-row Python (hashlib in
    # _extract_meta) needs the explicit repartition or it runs on ONE
    # core (the same rule every heavy per-row operator follows)
    docs = with_payload(spread(spark, T_(spark, sf, "documents")))
    return docs.mapInPandas(_extract_meta, META_SCHEMA).orderBy("doc_id")


_HEXPOS = "strpos('0123456789abcdef', {c}) - 1"


def _hexbyte_sql(i: int) -> str:
    """int(digest[i:i+2], 16) in DuckDB."""
    hi = _HEXPOS.format(c=f"d[{i + 1}:{i + 1}]")
    lo = _HEXPOS.format(c=f"d[{i + 2}:{i + 2}]")
    return f"(({hi}) * 16 + ({lo}))"


MULTIMODAL_META_SQL = f"""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS d
  FROM documents
), dims AS (
  SELECT doc_id, n_bytes, d,
         CAST(16 + {_hexbyte_sql(0)} % 240 AS INT) AS width,
         CAST(16 + {_hexbyte_sql(2)} % 240 AS INT) AS height,
         CAST(1 + {_hexbyte_sql(4)} % 30 AS INT) AS n_frames
  FROM m
)
SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes, d AS digest,
       width, height, n_frames,
       CASE WHEN n_frames <= 1 THEN '0,0,0,0'
            ELSE array_to_string(
                   list_transform(range(0, {N_SAMPLED}),
                                  j -> CAST(j * (n_frames - 1) // {N_SAMPLED - 1} AS INT)),
                   ',')
       END AS sampled_frames
FROM dims
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
}
