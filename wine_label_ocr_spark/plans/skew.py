"""Explicit skew handling: salted keys for hot hosts.

North-rule requirement (BASELINE.json): "salted keys for skewed hosts"
must be explicit engineering, not just an AQE claim (SURVEY.md §4). The
fixture corpus deliberately puts ~30% of rows on 3 hot hosts so these
paths are exercised, not just written.

Two tools:

* ``salted_agg`` — two-phase aggregation: group on (key, salt) first
  (spreads one hot key over S reducers), then re-aggregate on key. For
  algebraic aggregates (sum/count/min/max) the result is identical to the
  direct groupBy; the only cost is a second tiny shuffle of |keys|·S rows.
* ``host_col`` / ``salt_col`` — the url-derived grouping key and the
  deterministic salt ``pmod(xxhash64(url), S)`` (stable across retries,
  so resumable runs re-salt identically).

AQE's skew-join splitting handles *join* skew at runtime; salting covers
the aggregation/bucketing side AQE does not rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def host_col(url: Column) -> Column:
    """Registrable host from a url (native regexp — no UDF)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)


def salt_col(url: Column, n_salts: int = 16) -> Column:
    """Deterministic salt derived from the full url — hot-host rows spread
    uniformly over ``n_salts`` partitions, stable across retries/resume."""
    return F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("int")


def salted_agg(df: DataFrame, key: Column | str, aggs: dict[str, tuple],
               url: str = "url", n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name → (kind, input column), kind in
    {"sum", "count", "min", "max"} (algebraic: partial + merge compose
    exactly). Phase 1 groups by (key, salt); phase 2 merges partials by
    key. Result equals the direct groupBy bit-for-bit for integer inputs.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    phase1_aggs = []
    for name, (kind, col) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        if kind == "count":
            phase1_aggs.append(F.count(c).alias(f"_p_{name}"))
        else:
            phase1_aggs.append(getattr(F, kind)(c).alias(f"_p_{name}"))
    p1 = (df.withColumn("_salt", salt_col(F.col(url), n_salts))
          .groupBy(keyc.alias("_key"), F.col("_salt"))
          .agg(*phase1_aggs))
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase2_aggs = [merge[kind](F.col(f"_p_{name}")).alias(name)
                   for name, (kind, _) in aggs.items()]
    return p1.groupBy(F.col("_key")).agg(*phase2_aggs)


def top_hosts(pages: DataFrame, n: int = 10, n_salts: int = 16) -> DataFrame:
    """Demo/verification op: per-host page counts + byte totals via the
    salted two-phase plan (oracle: plain GROUP BY host in SQL)."""
    withhost = pages.withColumn("_host", host_col(F.col("url")))
    out = salted_agg(
        withhost, "_host",
        {"n_pages": ("count", F.lit(1)),
         "total_bytes": ("sum", F.octet_length("html").cast("bigint"))},
        n_salts=n_salts)
    return (out.select(F.col("_key").alias("host"), "n_pages", "total_bytes")
            .orderBy(F.col("n_pages").desc(), "host").limit(n))
