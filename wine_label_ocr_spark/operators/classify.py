"""Model-based text filtering: a fasttext-style linear classifier over
hashed bag-of-n-gram features, and URL/domain blocklist filtering.

The classic web-corpus curation step (CCNet / GPT-3-style "quality
classifier"): score every document with a linear model over hashed
word uni+bi-gram counts and keep the positive side. The *model* is an
input — a ``(bucket, weight_scaled)`` table produced by any trainer
(MLlib logistic regression, fasttext export, …); this module is the
10^12-doc *scoring* path:

* feature hashing and counting happen WITHIN the row (sorted run-length
  over bucket ids — the n-gram explosion never shuffles);
* the weight table is broadcast (a fasttext-quality model is a few
  hundred MB at most after pruning; per-executor, not per-task), so the
  scoring join is map-side;
* the per-doc logit is a SUM of integer-scaled terms — exact,
  order-free, reproducible bit-for-bit in the DuckDB oracle — and the
  doc-keyed re-aggregation is partial-aggregated map-side, so the only
  doc-keyed shuffle carries ~one row per doc.

Reference analog: the confidence-scored detect→classify gate of
final_run_ocr.py (detector score thresholding), re-targeted at corpus
quality; the hashing trick is public (Weinberger et al. 2009, fastText).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedupe import _hash64
from .textops import tokens_col


def _grams(toks: Column, n_max: int) -> Column:
    """Word 1..n_max-grams of a token array (n-grams joined by space)."""
    out = toks
    for n in range(2, n_max + 1):
        sz = F.size(toks)
        grams_n = F.when(sz >= n, F.transform(
            F.sequence(F.lit(1), sz - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )).otherwise(F.array().cast("array<string>"))
        out = F.concat(out, grams_n)
    return out


def hashed_ngram_features(text: Column, n_max: int = 2,
                          n_buckets: int = 1 << 20,
                          oracle_safe: bool = False) -> Column:
    """``array<struct<bucket:bigint, cnt:bigint>>`` — hashed bag of
    lowercased word 1..n_max-grams, one entry per distinct bucket,
    counted entirely within the row (sorted run-length — no shuffle, no
    Python). ``oracle_safe`` selects the md5 hash flavor DuckDB can
    reproduce; production uses xxhash64."""
    from ..functions import let
    from .textops import runlength_pairs

    toks = F.transform(tokens_col(text), F.lower)
    buckets = let(toks, lambda t: F.transform(
        _grams(t, n_max), lambda g: F.pmod(_hash64(g, 0, oracle_safe),
                                           F.lit(n_buckets))))
    empty = F.array().cast("array<struct<bucket:bigint,cnt:bigint>>")
    return F.when(F.size(tokens_col(text)) > 0,
                  let(F.array_sort(buckets),
                      lambda b: runlength_pairs(b, "bucket", "cnt"))) \
            .otherwise(empty)


def linear_text_classifier(df: DataFrame, weights: DataFrame,
                           bias_scaled: int = 0, id_col: str = "doc_id",
                           text_col: str = "text", n_max: int = 2,
                           n_buckets: int = 1 << 20,
                           oracle_safe: bool = False) -> DataFrame:
    """Score documents with a linear model over hashed n-gram counts.

    ``weights`` is a ``(bucket:bigint, weight_scaled:bigint)`` table
    (weights pre-scaled by 1e6 and rounded by the trainer/exporter);
    missing buckets weigh 0 (pruned model). Returns one row per input
    document: ``(doc_id, n_features, logit_scaled, keep)`` where
    ``logit_scaled = bias + Σ cnt·w`` exactly (bigint math) and
    ``keep = logit_scaled > 0`` — the sigmoid is monotone, so the
    decision threshold lives in logit space and the score stays
    engine-exact. Documents with no in-vocabulary feature still come
    back (logit = bias): a pruned model must not silently drop docs.
    """
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        hashed_ngram_features(F.col(text_col), n_max, n_buckets,
                              oracle_safe).alias("_f"))
    ex = (feats.select("doc_id", F.explode_outer("_f").alias("e"))
          .select("doc_id", F.col("e.bucket").alias("bucket"),
                  F.col("e.cnt").alias("cnt")))
    w = F.broadcast(weights.select("bucket", "weight_scaled"))
    scored = ex.join(w, "bucket", "left")
    return (scored.groupBy("doc_id")
            .agg((F.lit(int(bias_scaled))
                  + F.coalesce(F.sum(F.col("cnt") * F.col("weight_scaled")),
                               F.lit(0))).cast("bigint").alias("logit_scaled"),
                 F.count(F.col("bucket")).cast("bigint").alias("n_features"))
            .select("doc_id", "n_features", "logit_scaled",
                    (F.col("logit_scaled") > 0).alias("keep")))


def host_suffixes(host: Column) -> Column:
    """All registrable suffixes of a hostname, shortest first:
    ``a.b.example.com`` → ``[example.com, b.example.com,
    a.b.example.com]`` (single-label hosts yield just themselves).
    The match key set for domain blocklists: a listed domain blocks
    itself and every subdomain."""
    from ..functions import let

    def sufs(parts: Column) -> Column:
        n = F.size(parts)
        lens = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
            F.when(n == 1, F.array(F.lit(1))).otherwise(
                F.array().cast("array<int>")))
        return F.transform(
            lens, lambda k: F.array_join(F.slice(parts, n - k + 1, k), "."))

    return let(F.split(F.lower(host), r"\."), sufs)


def filter_blocklisted(df: DataFrame, blocklist: DataFrame,
                       url_col: str = "url") -> DataFrame:
    """Drop rows whose URL host is a blocklisted domain or any of its
    subdomains (UT1/adult-list-style curation). ``blocklist`` is a
    one-column ``(domain)`` table of lowercase registrable domains —
    list-sized, so it broadcasts; the probe side explodes each row into
    its ≤ ~5 host suffixes and left-anti joins. The host is normalized
    first (``registrable_host``: lowercase, userinfo and port stripped),
    so ``https://example.com:8080/x`` and ``https://u@EXAMPLE.com`` are
    blocked by a listed ``example.com`` like any other spelling of the
    same authority. Rows with no parseable http(s) host are KEPT (a
    blocklist filter must not eat non-web rows; gate them separately if
    needed)."""
    from .textops import registrable_host

    probe = df.withColumn("_sfx",
                          host_suffixes(registrable_host(F.col(url_col))))
    hit = (probe.select(F.col(url_col).alias("_u"),
                        F.explode("_sfx").alias("domain"))
           .join(F.broadcast(blocklist.select(F.lower(F.col(
               blocklist.columns[0])).alias("domain"))), "domain", "left_semi")
           .select(F.col("_u").alias(url_col)).distinct())
    return probe.join(hit, url_col, "left_anti").select(*df.columns)
