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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.table import ManifestTable
from .textops import surt_key

# RFC 4648 Base32 alphabet — CDX(J) digests are Base32(SHA-1), 20 bytes
# → exactly 32 chars, no padding (the Wayback/pywb convention).
_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def sha1_base32(body: Column) -> Column:
    """Base32-encoded SHA-1 of ``body`` — the CDX(J) content-digest
    convention (pywb `to_b32`-compatible): 160 bits → 32 chars of the
    RFC 4648 alphabet, no padding. Pure column algebra: the 40-char hex
    digest splits into four 40-bit groups (each fits a BIGINT via
    ``conv``), each group yields eight 5-bit alphabet indexes."""
    hx = F.sha1(body)
    chars = []
    for g in range(4):
        word = F.conv(F.substring(hx, 1 + g * 10, 10), 16, 10).cast("bigint")
        for j in range(8):
            idx = F.shiftright(word, 5 * (7 - j)).bitwiseAND(F.lit(31))
            chars.append(F.substring(F.lit(_B32_ALPHABET), idx + 1, F.lit(1)))
    return F.concat(*chars)


def _prefix_successor(prefix: str) -> str | None:
    """Smallest string greater than every string with ``prefix``:
    increment the last code point (dropping trailing U+10FFFF chars
    that cannot be incremented). Correct for ALL code points including
    astral ones — unlike appending U+FFFF, which sorts BELOW e.g. a raw
    emoji and would wrongly exclude such keys. None = unbounded (the
    degenerate all-U+10FFFF prefix)."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def cdx_records(pages: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                payload_col: str | None = "html") -> DataFrame:
    """pages → CDX capture rows ``(surt, url, ts, digest, length)``.

    ``digest``/``length`` come from ``payload_col`` when present
    (Base32-encoded SHA-1 over the raw bytes — the CDX(J) content-digest
    convention, interoperable with Wayback/pywb digests); both NULL
    when the payload column is absent. Non-http(s) URLs (NULL surt) are
    dropped: they cannot be keyed. Pure map."""
    cols = [surt_key(F.col(url_col)).alias("surt"),
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts")]
    if payload_col is not None and payload_col in pages.columns:
        body = F.col(payload_col).cast("binary")
        cols += [sha1_base32(body).alias("digest"),
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
    (range: every capture under the prefix) must be given. Point
    lookups prune with the exact range ``key_between=(key, key)``;
    prefix lookups prune with ``(prefix, successor(prefix))`` where the
    successor increments the prefix's last code point — exact for ALL
    code points including astral ones (appending U+FFFF would wrongly
    exclude SURT keys whose next code point is > U+FFFF, e.g. raw emoji
    in a path). The residual filter keeps the answer exact either
    way."""
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
    df = table.read(spark,
                    key_between=(surt_prefix, _prefix_successor(surt_prefix)))
    return (spark.createDataFrame([], "surt string, url string, "
                                  "ts timestamp, digest string, "
                                  "length bigint")
            if df is None else
            df.where(F.col("surt").startswith(surt_prefix)))


def revisit_records(pages: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    payload_col: str = "html",
                    keep_payload: bool = False) -> DataFrame:
    """WARC revisit-record classification (the WARC 1.1
    identical-payload-digest profile, the Common Crawl storage
    dedup): among all captures sharing a (surt, digest) pair, the
    FIRST by (ts, url) stays a full ``response`` record; every later
    one becomes a ``revisit`` pointing at the original via
    (refers_to_url, refers_to_ts) — at archive scale this is most of
    the corpus (unchanged pages re-fetched every crawl), stored as a
    ~100-byte pointer instead of the payload.

    Output: ``(surt, url, ts, digest, length, record_type,
    refers_to_url, refers_to_ts)`` with refers_to_* NULL on responses.

    ``keep_payload=True`` adds the payload bytes back as ``html`` —
    non-NULL ONLY on responses (revisits are pointers) — so the result
    feeds ``sources.warc.write_warc_shards`` directly as a deduped
    export (``export_deduped_warc``). The payload then rides the one
    (surt, digest) shuffle; with it off, only the ~100-byte capture
    rows shuffle.

    Scale shape: ONE window over (surt, digest) — the same key the CDX
    index is range-partitioned on, so on a committed index the sort is
    cluster-local; no self-join, no second scan of payload bytes (the
    digest is computed once by ``cdx_records``)."""
    from pyspark.sql import Window
    recs = cdx_records(pages, url_col, ts_col, payload_col)
    if keep_payload:
        body = pages.select(
            F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
            F.col(payload_col).cast("binary").alias("_payload"))
        # plan-local re-attach: (url, ts) is the capture's identity, so
        # this is a narrow 1:1 join the optimizer collapses into the
        # same scan lineage (no second pass over the page bytes)
        recs = recs.join(body, ["url", "ts"])
    w = Window.partitionBy("surt", "digest").orderBy("ts", "url")
    first_url = F.first("url").over(w)
    first_ts = F.first("ts").over(w)
    rn = F.row_number().over(w)
    # NULL digest = unknown payload (fetch failure / payload_col
    # absent): the identical-payload relation is unverifiable, so such
    # captures are ALWAYS stored as full responses — never classified
    # as revisits of each other (ADVICE r8; window NULLs group
    # together, which would otherwise collapse every NULL-digest
    # capture of a surt onto the first one).
    is_resp = (rn == 1) | F.col("digest").isNull()
    out_cols = [
        "surt", "url", "ts", "digest", "length",
        F.when(is_resp, F.lit("response")).otherwise(F.lit("revisit"))
         .alias("record_type"),
        F.when(~is_resp, first_url).alias("refers_to_url"),
        F.when(~is_resp, first_ts).alias("refers_to_ts")]
    if keep_payload:
        out_cols.append(
            F.when(is_resp, F.col("_payload")).alias("html"))
    return recs.select(*out_cols)
