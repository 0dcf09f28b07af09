"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The documents table's ``html`` column IS the binary payload here (the
container has no image/audio codecs, so the decode step for those
modalities is STUBBED — deterministic fake features clearly marked —
while the Spark-side plumbing: schema, batch iteration, partitioning,
UDF signatures, is real and tested).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..derive import documents_wide_sql
from ..dialect import blob_to_str, octet_len, sha256_hex

# ---------------------------------------------------------------------------
# SQL surface (oracle-checkable): binary metadata + decode round-trip
# ---------------------------------------------------------------------------


def q_html_meta(d: str) -> str:
    """Binary payload metadata + byte-identity: html must decode back to
    '<html>' || text || '</html>' (per-row invariant, BASELINE.json)."""
    decoded = blob_to_str("html", d)
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')})
SELECT url, {octet_len('html', d)} AS html_bytes,
  {sha256_hex(decoded, d)} AS html_sha256,
  (case when {decoded} =
        concat('<html>', text, '</html>') then 1 else 0 end) AS roundtrip_ok
FROM docs"""


# ---------------------------------------------------------------------------
# mapInPandas feature extraction (Arrow batches; decode step stubbed)
# ---------------------------------------------------------------------------

FEATURE_DIM = 8
FEATURES_SCHEMA = ("url string, modality string, n_bytes long, "
                   "features array<float>")


def _fake_decode_features(payload: bytes, modality: str) -> np.ndarray:
    """STUB decoder: the container lacks image/audio codecs, so this
    derives a deterministic feature vector from a sha256 of the payload.
    In production this is the only function to replace (PIL/ffmpeg/etc.);
    everything around it — batching, schema, partitioning — is real."""
    digest = hashlib.sha256(modality.encode() + payload).digest()
    ints = np.frombuffer(digest[:FEATURE_DIM * 4], dtype=np.uint32)
    return (ints / np.float64(2 ** 32)).astype(np.float32)


def extract_features(df: DataFrame, payload_col: str = "html",
                     modality: str = "html") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Plan shape: narrow projection -> mapInPandas (no shuffle); at scale
    this pipelines with the parquet scan and never materializes payloads
    outside the Arrow batch."""
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(df.sparkSession)
    cols = df.select("url", payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [_fake_decode_features(bytes(p), modality)
                     for p in payloads]
            yield pd.DataFrame({
                "url": pdf["url"],
                "modality": modality,
                "n_bytes": payloads.map(len).astype("int64"),
                "features": [f.tolist() for f in feats],
            })

    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_stub(df: DataFrame, payload_col: str = "html",
                target: tuple[int, int] = (64, 64)) -> DataFrame:
    """Image-resize plumbing: same mapInPandas shape; the pixel work is
    NotImplemented in this container by design."""
    raise NotImplementedError(
        "image decode/resize requires codecs not present in this "
        "container; use extract_features for the stubbed feature path")
