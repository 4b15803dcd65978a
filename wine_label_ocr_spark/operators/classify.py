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


def lang_char_features(text: Column, n_min: int = 2, n_max: int = 3,
                       n_buckets: int = 1 << 18, max_chars: int = 192,
                       oracle_safe: bool = False) -> Column:
    """``array<struct<bucket:bigint, cnt:bigint>>`` — hashed bag of
    character n-grams (the classic statistical lang-id feature space:
    Cavnar–Trenkle n-gram profiles / langid.py / fastText's char-gram
    subwords), counted within the row like ``hashed_ngram_features``.

    Normalization: lowercase, whitespace collapsed to single spaces,
    trimmed, truncated to ``max_chars`` — the truncation is the scale
    lever: language is decided by the first ~200 chars, so a 100 KB doc
    costs the same as a tweet and the gram explosion is bounded at
    ``(max_chars·(n_max-n_min+1))`` entries per row, never shuffled."""
    from ..functions import let
    from .textops import runlength_pairs

    s = F.substring(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")),
        1, max_chars)

    def grams_of(t: Column) -> Column:
        # closure factory, NOT `lambda i, _n=n:` — PySpark's HOF lambda
        # introspection binds any second parameter as the element INDEX
        def gram_fn(n: int):
            return lambda i: t.substr(i, F.lit(n))

        parts = []
        for n in range(n_min, n_max + 1):
            idx = F.sequence(F.lit(1), F.length(t) - F.lit(n - 1))
            parts.append(F.when(
                F.length(t) >= n,
                F.transform(idx, gram_fn(n)))
                .otherwise(F.array().cast("array<string>")))
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return out

    buckets = let(s, lambda t: F.transform(
        grams_of(t), lambda g: F.pmod(_hash64(g, 0, oracle_safe),
                                      F.lit(n_buckets))))
    empty = F.array().cast("array<struct<bucket:bigint,cnt:bigint>>")
    return F.when(F.length(s) >= n_min,
                  let(F.array_sort(buckets),
                      lambda b: runlength_pairs(b, "bucket", "cnt"))) \
            .otherwise(empty)


def lang_nb_weights(seed: DataFrame, lang_col: str = "lang",
                    text_col: str = "text", n_min: int = 2, n_max: int = 3,
                    n_buckets: int = 1 << 18, max_chars: int = 192,
                    oracle_safe: bool = False,
                    scale: int = 1_000_000) -> tuple[DataFrame, DataFrame]:
    """Multinomial-naive-Bayes weights from a per-language seed corpus
    ``seed (lang, text)`` — the TRAIN side of ``lang_id_classifier``.

    Returns ``(weights, base)``:

    * ``weights (lang, bucket, w_scaled)`` with
      ``w_scaled = round(ln(cnt+1)·scale)`` — the add-one-smoothed
      log-likelihood RELATIVE to the language's unseen-gram baseline,
      so a bucket absent from the table exactly contributes 0 and the
      pruned-model join stays sparse;
    * ``base (lang, unk_scaled)`` with
      ``unk_scaled = round(ln(1/(tot_lang+V))·scale)`` — the per-GRAM
      baseline each document pays ``n_grams`` times (V = distinct
      buckets across all seeds, the shared smoothing vocabulary).

    ``logit(doc, lang) = n_grams·unk_scaled + Σ cnt·w_scaled`` is then
    the exact integer-scaled NB log-likelihood (equal priors), order-free
    and bit-reproducible in the DuckDB oracle. Both tables are
    seed-corpus-sized (broadcast side); everything here is column
    algebra over the seed DataFrame, so the same code trains from a
    10-row fixture or a million-sentence Tatoeba-style dump."""
    feats = seed.select(
        F.col(lang_col).alias("lang"),
        F.explode(lang_char_features(F.col(text_col), n_min, n_max,
                                     n_buckets, max_chars,
                                     oracle_safe)).alias("e"))
    cnt = (feats.groupBy("lang", F.col("e.bucket").alias("bucket"))
           .agg(F.sum("e.cnt").alias("cnt")))
    v = cnt.select(F.countDistinct("bucket").alias("V"))
    tot = cnt.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    weights = cnt.select(
        "lang", "bucket",
        F.round(F.log(F.col("cnt") + 1) * scale).cast("bigint")
         .alias("w_scaled"))
    base = tot.crossJoin(v).select(
        "lang",
        F.round(F.log(F.lit(1.0) / (F.col("tot") + F.col("V"))) * scale)
         .cast("bigint").alias("unk_scaled"))
    return weights, base


def lang_id_classifier(df: DataFrame, seed: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_min: int = 2, n_max: int = 3,
                       n_buckets: int = 1 << 18, max_chars: int = 192,
                       oracle_safe: bool = False) -> DataFrame:
    """Statistical language id (r8 VERDICT #3): multinomial-NB argmax
    over hashed char n-grams, trained from ``seed (lang, text)`` —
    the model-based upgrade of ``textops.lang_id``'s marker heuristic
    (keep the markers as the cheap prefilter; use this head where the
    markers degrade: function-word-free text, short fragments,
    morphology-heavy languages).

    Returns one row per document: ``(doc_id, lang, logit_scaled,
    margin_scaled)`` — ``lang`` NULL when the text yields no grams
    (unknowable), ``margin_scaled`` = best minus second-best logit
    (0 with a single-language seed), the confidence column downstream
    gates threshold on. Ties break toward the lexicographically
    smallest language.

    Scale shape: the lang list and per-language baselines are collected
    once (lexicon-sized, the centroid-collect shape); weights pivot to
    one broadcast ``(bucket, w_<lang>…)`` row per bucket, so scoring is
    a map-side join + ONE slim doc-keyed aggregation — per-language
    sums are columns, not rows, and the gram explosion never leaves its
    scan partition. Reference analog: detect_charset's
    score-every-variant-then-argmax (``oracle.py``), re-targeted from
    OCR charsets to languages."""
    weights, base = lang_nb_weights(seed, n_min=n_min, n_max=n_max,
                                    n_buckets=n_buckets,
                                    max_chars=max_chars,
                                    oracle_safe=oracle_safe)
    langs_unk = sorted((r["lang"], r["unk_scaled"])
                       for r in base.collect())
    langs = [lang for lang, _ in langs_unk]
    if not langs:
        raise ValueError("lang_id_classifier: empty seed corpus")
    w_piv = (weights.groupBy("bucket")
             .pivot("lang", langs).agg(F.first("w_scaled")))

    feats = df.select(
        F.col(id_col).alias("doc_id"),
        lang_char_features(F.col(text_col), n_min, n_max, n_buckets,
                           max_chars, oracle_safe).alias("_f"))
    feats = feats.select(
        "doc_id",
        F.aggregate("_f", F.lit(0).cast("bigint"),
                    lambda acc, e: acc + e["cnt"]).alias("_n_grams"),
        F.explode_outer("_f").alias("e"))
    scored = feats.join(
        F.broadcast(w_piv),
        feats["e.bucket"] == w_piv["bucket"], "left")
    sums = scored.groupBy("doc_id").agg(
        F.first("_n_grams").alias("_n_grams"),
        *[F.coalesce(F.sum(F.col("e.cnt") * F.col(lang)), F.lit(0))
          .cast("bigint").alias(f"_s_{lang}") for lang in langs])
    logit_arr = F.array(*[
        F.struct(
            (F.col(f"_s_{lang}")
             + F.col("_n_grams") * F.lit(int(unk))).cast("bigint")
            .alias("logit"),
            F.lit(lang).alias("lang"))
        for lang, unk in langs_unk])
    ranked = F.array_sort(
        logit_arr,
        lambda a, b: F.when(a["logit"] > b["logit"], F.lit(-1))
                      .when(a["logit"] < b["logit"], F.lit(1))
                      .when(a["lang"] < b["lang"], F.lit(-1))
                      .when(a["lang"] > b["lang"], F.lit(1))
                      .otherwise(F.lit(0)))
    best = F.get(ranked, 0)
    second = F.get(ranked, 1)
    return sums.select(
        "doc_id",
        F.when(F.col("_n_grams") > 0, best["lang"]).alias("lang"),
        F.when(F.col("_n_grams") > 0, best["logit"]).otherwise(F.lit(0))
         .cast("bigint").alias("logit_scaled"),
        F.when((F.col("_n_grams") > 0) & second["logit"].isNotNull(),
               best["logit"] - second["logit"]).otherwise(F.lit(0))
         .cast("bigint").alias("margin_scaled"))


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
