"""Multimodal (binary) columns — SURVEY.md §2.11 row 81.

Model: media is an opaque ``BinaryType`` payload + a typed metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the only
layer where real codec libraries would live).  The container has no
image/audio libraries, so the real decoder is a clearly-marked stub
(NotImplementedError) and a DETERMINISTIC fake decoder exercises the full
Spark-side plumbing — schema, batching, partitioning — with arithmetic
simple enough that the DuckDB oracle checks it exactly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import query
from ..core.tables import load

FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, payload_len long"
)

USE_REAL_CODEC = False  # the container ships no image/audio libs


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires a codec library (PIL / ffmpeg) that is
    not available in this environment."""
    raise NotImplementedError(
        "real media decoding needs an image/audio codec library; "
        "install one and flip USE_REAL_CODEC"
    )


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: derive (width, height) from payload length
    and first byte — stable across runs/executors, oracle-expressible."""
    width = len(payload) % 64 + 1
    height = (payload[0] if payload else 0) % 32 + 1
    return width, height


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary).

    Arrow-batched: each partition arrives as an iterator of pandas frames;
    per-batch vectorized work, constant memory per batch — the shape real
    decode at 100 TB needs (payloads never concatenate into one frame).
    """
    decode = _decode_real if USE_REAL_CODEC else _decode_fake

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
            })
            out["n_pixels"] = out["width"].astype("int64") * out["height"]
            out["payload_len"] = [len(p) for p in pdf["payload"]]
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


@query("q_llm_multimodal", oracle="""
WITH media AS (
  SELECT doc_id, encode(text) AS payload FROM documents
)
SELECT doc_id,
       octet_length(payload) AS payload_len,
       substr(base64(payload), 1, 24) AS b64_prefix,
       octet_length(payload) % 64 + 1 AS width,
       ascii(substr(text, 1, 1)) % 32 + 1 AS height,
       CAST((octet_length(payload) % 64 + 1)
            * (ascii(substr(text, 1, 1)) % 32 + 1) AS BIGINT) AS n_pixels
FROM media JOIN documents USING (doc_id)
""")
def q_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns end-to-end (row 81): text bytes stand in for an
    image payload (BinaryType), metadata via base64/octet arithmetic, and
    the feature columns produced by the REAL mapInPandas decode path
    (fake codec) — every value oracle-checked.

    documents.text is ASCII (word soup), so ascii(first char) in the oracle
    equals payload[0] in the decoder.
    """
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    feats = decode_features(media)
    meta = media.select(
        "doc_id",
        F.substring(F.base64("payload"), 1, 24).alias("b64_prefix"),
    )
    return (
        feats.join(meta, "doc_id")
        .select("doc_id", "payload_len", "b64_prefix",
                "width", "height", "n_pixels")
    )
