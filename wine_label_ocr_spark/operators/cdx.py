"""CDX-style URL capture index over SURT keys — the web-archive lookup
structure (Wayback/pywb CDX(J), public format): one row per capture,
sorted by (SURT, timestamp), so "every capture of this URL" and "every
URL under this prefix" are contiguous range scans.

Spark-first shape: the index is a ``ManifestTable`` commit range-
partitioned and sorted on the SURT key with ``stats_col="surt"`` — the
manifest records per-file [min, max] SURT from the parquet footers, so a
point or prefix lookup opens only the files whose range can overlap
(file-level pruning BEFORE the scan). At 100 TB that is the difference
between a lookup reading ~1/n_files of the index and reading all of it.

Reference parity: the reference keeps its processed-label lookup as one
JSONL dict scanned linearly (hybrid.py:270-271); this is the same
"have we captured this?" need re-expressed as a sorted, pruned,
snapshot-committed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.table import ManifestTable
from .textops import surt_key

# one code point above every byte that appears in a lowercased SURT —
# ``(prefix, prefix + _HI)`` is the inclusive range covering the prefix
_HI = "￿"


def cdx_records(pages: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                payload_col: str | None = "html") -> DataFrame:
    """pages → CDX capture rows ``(surt, url, ts, digest, length)``.

    ``digest``/``length`` come from ``payload_col`` when present (sha1
    over the raw bytes — the CDX content-digest convention); both NULL
    when the payload column is absent. Non-http(s) URLs (NULL surt) are
    dropped: they cannot be keyed. Pure map."""
    cols = [surt_key(F.col(url_col)).alias("surt"),
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts")]
    if payload_col is not None and payload_col in pages.columns:
        body = F.col(payload_col).cast("binary")
        cols += [F.sha1(body).alias("digest"),
                 F.length(body).cast("bigint").alias("length")]
    else:
        cols += [F.lit(None).cast("string").alias("digest"),
                 F.lit(None).cast("bigint").alias("length")]
    return pages.select(*cols).where(F.col("surt").isNotNull())


def cdx_commit(pages: DataFrame, root: str, n_files: int = 8,
               url_col: str = "url", ts_col: str = "warc_ts",
               payload_col: str | None = "html") -> ManifestTable:
    """Build and commit a CDX index: range-repartition the capture rows
    on ``surt`` (files cover disjoint key ranges → razor-sharp footer
    stats), sort (surt, ts) within each file (row-group locality for
    the per-URL capture timeline), append through ``ManifestTable``
    with ``stats_col='surt'``. Incremental crawls keep appending — the
    manifest carries per-file ranges across commits, so pruning keeps
    working without a global rewrite."""
    recs = (cdx_records(pages, url_col, ts_col, payload_col)
            .repartitionByRange(n_files, "surt")
            .sortWithinPartitions("surt", "ts"))
    table = ManifestTable(root)
    table.append(recs, stats_col="surt")
    return table


def cdx_lookup(spark: SparkSession, root: str, url: str | None = None,
               surt_prefix: str | None = None) -> DataFrame:
    """Prefix/point lookup against a committed CDX index. Exactly one of
    ``url`` (point: all captures of that URL's SURT) or ``surt_prefix``
    (range: every capture under the prefix) must be given. The manifest
    range ``key_between=(key, key + _HI)`` skips non-overlapping files
    before the scan; the residual filter keeps the answer exact."""
    if (url is None) == (surt_prefix is None):
        raise ValueError("pass exactly one of url= or surt_prefix=")
    table = ManifestTable(root)
    if url is not None:
        key_df = spark.range(1).select(surt_key(F.lit(url)).alias("k"))
        key = key_df.head()[0]
        if key is None:
            raise ValueError(f"not an http(s) URL: {url!r}")
        df = table.read(spark, key_between=(key, key))
        return (spark.createDataFrame([], "surt string, url string, "
                                      "ts timestamp, digest string, "
                                      "length bigint")
                if df is None else df.where(F.col("surt") == key))
    df = table.read(spark, key_between=(surt_prefix, surt_prefix + _HI))
    return (spark.createDataFrame([], "surt string, url string, "
                                  "ts timestamp, digest string, "
                                  "length bigint")
            if df is None else
            df.where(F.col("surt").startswith(surt_prefix)))
