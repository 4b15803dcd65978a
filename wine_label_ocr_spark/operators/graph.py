"""Web link-graph operators: outlink extraction, host-level edges, and
an exactly-reproducible PageRank.

The crawl-side complement of the curation suite: outlinks drive frontier
expansion and host authority; PageRank-style host scores are a standard
corpus-quality prior (pages from high-authority hosts survive filtering
more often). Reference analog: the detect→associate step of the
reference's span matcher (J7) re-targeted at page→page references.

Scale shapes:

* ``extract_outlinks`` is a pure map (JVM ``regexp_extract_all``) —
  zero Exchange, no Python;
* ``host_edges`` is one distinct over (src, dst) — a narrow shuffle of
  host-pair strings;
* ``pagerank`` is the classic iterate-until-k loop expressed as k
  narrow (dst-keyed) aggregations over the edge list. All rank math is
  SCALED BIGINT with floor division — bit-identical on any engine and
  any partitioning, so the driver gate can hash-compare against a
  DuckDB recursive-CTE twin (floating-point PageRank would differ in
  the last ulp between engines). Each iteration ``localCheckpoint``s
  the rank table (same lineage-cut pattern as
  ``dedupe.connected_components``) so the plan does not grow with k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# href extraction: RE2-compatible (no lookarounds), shared verbatim with
# the DuckDB oracle.  The tag name must be `a` or `area` (image-map
# links) followed by whitespace — the boundary keeps <abbr>/<basefont>
# out without dropping <area href> navigation — and the single capture
# group serves quoted AND unquoted values by keeping the quotes in the
# capture; `href_values` strips them.  Unquoted values (`href=/bare` —
# common in old hand-written HTML; previously a silent drop) run to the
# first whitespace or `>` per the HTML5 unquoted-attribute rule.
# Fragment-only links (`#...`) are excluded in every branch.
HREF_PATTERN = (r"<(?i:a|area)\s(?:[^>]*\s)?(?i:href)\s*=\s*"
                r"(\"[^\"#][^\"]*\"|'[^'#][^']*'|[^\s\"'>#][^\s>]*)")

# <base href="..."> pickup: the FIRST base tag governs (HTML spec);
# regexp_extract returns the first match.  `<base` must be followed by
# whitespace — without the boundary, a deprecated-but-real
# <basefont href=...> tag would hijack the base and mis-resolve every
# relative link on the page.
BASE_PATTERN = (r"<[bB][aA][sS][eE]\s(?:[^>]*\s)?(?i:href)\s*=\s*"
                r"[\"']([^\"']+)[\"']")


def _unquote(v):
    """Strip one layer of surrounding quotes off a captured href value
    (quoted captures keep their quotes so HREF_PATTERN needs only one
    group). Pure column algebra; mirrored in the DuckDB oracle as
    ``CASE WHEN v[1] IN ('\"', '''') THEN v[2:-2] ELSE v END``."""
    q = v.substr(F.lit(1), F.lit(1))
    return F.when((q == '"') | (q == "'"),
                  v.substr(F.lit(2), F.length(v) - 2)).otherwise(v)


def href_values(html_col) -> "F.Column":
    """All href values in a page as an array<string> (quotes stripped,
    fragment-only links excluded) — the one extraction every consumer
    (outlinks, WAT sidecar, crawl cycle) shares."""
    return F.transform(
        F.regexp_extract_all(html_col, F.lit(HREF_PATTERN), 1), _unquote)

PR_SCALE = 1_000_000_000_000  # 10^12: rank mass in integer micro-units


def extract_outlinks(df: DataFrame, id_col: str = "url",
                     html_col: str = "html",
                     resolve: bool = False) -> DataFrame:
    """One row per (page, outlink href).

    ``resolve=False``: raw hrefs as written — pure map, JVM regex, zero
    Exchange. ``resolve=True`` adds a ``resolved`` column: the absolute
    URL per RFC 3986 (``textops.resolve_href``) against the page's
    effective base — the first ``<base href>`` tag when present (itself
    resolved against the page URL, as the HTML spec requires), else the
    page URL. Still a pure map: the base pickup and resolution are
    column algebra over the exploded rows."""
    out = df.select(F.col(id_col).alias("src"),
                    *( [F.regexp_extract(F.col(html_col),
                                         BASE_PATTERN, 1).alias("_basetag")]
                       if resolve else [] ),
                    F.explode(href_values(F.col(html_col))).alias("href"))
    if not resolve:
        return out
    from .textops import resolve_href
    eff_base = F.when(F.col("_basetag") == "", F.col("src")) \
                .otherwise(resolve_href(F.col("src"), F.col("_basetag")))
    return (out.withColumn("resolved",
                           resolve_href(eff_base, F.col("href")))
            .drop("_basetag"))


def host_edges(links: DataFrame, src_col: str = "src",
               href_col: str = "href",
               resolve_relative: bool = False) -> DataFrame:
    """Distinct (src_host, dst_host) edges from http(s) outlinks. With
    ``resolve_relative=False`` only absolute hrefs form edges (relative
    links have no host and drop out); with ``resolve_relative=True``
    each href is first resolved against ``src_col`` (which must then be
    the page URL) via RFC 3986, so relative links contribute their
    (self-)host edges too. Hosts are normalized via
    ``registrable_host`` (lowercase, userinfo/port stripped) so
    ``a.com`` and ``a.com:8080`` are ONE PageRank node — split
    authorities would silently dilute rank mass. Self-edges are kept;
    PageRank handles them like any other edge."""
    from .textops import registrable_host, resolve_href
    dst = F.col(href_col)
    if resolve_relative:
        dst = resolve_href(F.col(src_col), dst)
    return (links.select(registrable_host(F.col(src_col)).alias("src_host"),
                         registrable_host(dst).alias("dst_host"))
            .filter(F.col("src_host").isNotNull()
                    & F.col("dst_host").isNotNull())
            .distinct())


def pagerank(edges: DataFrame, n_iters: int = 5, damping_pct: int = 85,
             src_col: str = "src_host", dst_col: str = "dst_host",
             redistribute_dangling: bool = False) -> DataFrame:
    """Exact fixed-point PageRank over a distinct edge list:
    ``(host, rank_scaled)`` with rank in integer units of ``PR_SCALE``.

    All arithmetic is TRUE bigint integer division (SQL ``div`` — never
    a double division cast back, so exactness is structural, not a
    magnitude accident) — the result is EXACTLY reproducible across
    engines, partitionings, and cluster sizes (the driver gate hashes it
    against a DuckDB recursive-CTE twin; float PageRank cannot pass such
    a gate).

    Dangling hosts (in-links only) receive the teleport term but have no
    outflow. With ``redistribute_dangling=False`` their mass simply
    leaves the system — the standard simplification when ranks are a
    relative quality prior. With ``True``, each iteration adds the
    damped dangling mass back uniformly —
    ``(damping_pct * Σ_dangling rank) div 100 div n`` per node, one
    extra scalar aggregation joined in as a 1-row broadcast — keeping
    ``Σ ranks = PR_SCALE`` up to the ≤ n floor-rounding deficit (mass
    conservation, pytest-pinned).

    Per iteration: one dst-keyed aggregation of ``share = r div deg``
    (map-side partial sums) + a left join back onto the node list; the
    rank table is ``localCheckpoint``ed so lineage stays O(1) in k.
    """
    # materialize the loop-invariant sides ONCE: without the checkpoint,
    # every iteration re-runs the edge distinct() and the degree agg
    # from source lineage (k× redundant shuffles on a big edge list)
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct() \
             .localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("host"))
             .unionByName(e.select(F.col("dst").alias("host")))
             .distinct()).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")) \
           .localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("bigint"))
    base = int(PR_SCALE) // n
    teleport = (int(PR_SCALE) * (100 - damping_pct)) // 100 // n
    ranks = nodes.withColumn("rank_scaled", F.lit(base).cast("bigint")) \
                 .localCheckpoint(eager=True)
    for _ in range(int(n_iters)):
        shares = (e.join(ranks, e["src"] == ranks["host"])
                  .join(deg, "src")
                  .select(F.col("dst").alias("host"),
                          F.expr("rank_scaled div deg").alias("share")))
        inflow = shares.groupBy("host").agg(
            F.sum("share").cast("bigint").alias("inflow"))
        damped = F.expr(
            f"({int(damping_pct)}L * coalesce(inflow, 0L)) div 100")
        new = nodes.join(inflow, "host", "left")
        if redistribute_dangling:
            # Σ rank over hosts with no out-edges, damped, split evenly:
            # a 1-row scalar aggregation cross-joined in (broadcast).
            dangling = (ranks.join(deg, ranks["host"] == deg["src"],
                                   "left_anti")
                        .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0))
                             .cast("bigint").alias("_dangling")))
            new = new.crossJoin(F.broadcast(dangling))
            damped = damped + F.expr(
                f"({int(damping_pct)}L * _dangling) div 100 div {n}L")
        ranks = (new.select("host",
                            (F.lit(teleport) + damped)
                            .cast("bigint").alias("rank_scaled"))
                 .localCheckpoint(eager=True))
    return ranks


# anchor-text pickup: same RE2-safe href machinery as HREF_PATTERN plus a
# second capture for the anchor's inner text.  [^<]* means anchors with
# nested markup (<a ...><b>x</b></a>) do NOT match — a documented
# simplification shared verbatim with the DuckDB oracle (capturing
# through nested tags needs non-greedy dotall across tags, which the
# shared dialect supports, but the *text* of nested markup would then
# include tag bytes; dropping nested anchors is the cleaner contract).
# Only <a> qualifies (an <area> has no inner text by construction).
ANCHOR_PATTERN = (r"<(?i:a)\s(?:[^>]*\s)?(?i:href)\s*=\s*"
                  r"(\"[^\"#][^\"]*\"|'[^'#][^']*'|[^\s\"'>#][^\s>]*)"
                  r"[^>]*>([^<]*)</(?i:a)\s*>")


# one combined alternation so a page is lexed ONCE for both consumers:
# at an `<a ...>simple text</a>` span the ANCHOR alternative wins
# (ordered alternation) and captures href + text; an <area>, a nested-
# markup anchor, or any other <a href> the anchor shape can't express
# falls through to the HREF alternative at the same scan position —
# every href attr HREF_PATTERN finds is still found exactly once.
# Groups: 1 = anchor href, 2 = anchor text, 3 = bare href.
PAGE_LINKS_PATTERN = ANCHOR_PATTERN + "|" + HREF_PATTERN


def page_links(df: DataFrame, id_col: str = "url",
               html_col: str = "html", resolve: bool = True) -> DataFrame:
    """ONE extraction + ONE RFC 3986 resolve pass feeding BOTH frontier
    expansion and the anchor-text index: ``(src, href, anchor, resolved)``
    with ``anchor`` NULL for links that are not simple-text ``<a>``
    anchors (area hrefs, nested-markup anchors).

    The one-scan links table for callers that MATERIALIZE it once
    (persist/write) and feed several consumers: frontier expansion,
    anchor index, host graph. Row parity with
    ``extract_outlinks(resolve=True)`` is structural (same href char
    classes, one row per href attr) and pytest-pinned; anchor rows are
    identical to ``anchor_pairs`` (same ANCHOR_PATTERN semantics,
    whitespace-normalized text). Unlike the standalone
    ``anchor_text_index(resolve=True)``, resolution here honors the
    page's ``<base href>`` (the ``extract_outlinks`` rule).

    MEASURED CAVEAT (BENCH.md r8): WITHOUT materialization each
    consumer re-evaluates this plan, and the combined alternation lexes
    slower than HREF_PATTERN alone — crawl_cycle(anchor_index_k=...)
    therefore builds its index from a separate ``anchor_pairs`` pass
    (1.11× the cycle alone vs 1.60× for the unmaterialized shared
    plan). Use this operator when the links table is written/cached
    once; use the per-consumer extractions when it is not."""
    h = F.col(html_col)
    # ONE scan of the page bytes (group 0 = whole match), then the
    # groups are re-extracted per MATCH — matches are tag-sized, so the
    # per-match regex is O(tag) not O(page); a 3-group × 3-scan variant
    # measured 1.6x the whole-page lexing cost of this shape
    matches = F.regexp_extract_all(h, F.lit(PAGE_LINKS_PATTERN), 0)
    base_cols = ([F.regexp_extract(h, BASE_PATTERN, 1).alias("_basetag")]
                 if resolve else [])
    out = df.select(
        F.col(id_col).alias("src"), *base_cols,
        F.explode(matches).alias("m"),
    ).select(
        "src", *(["_basetag"] if resolve else []),
        F.regexp_extract(F.col("m"), PAGE_LINKS_PATTERN, 1).alias("_ah"),
        F.regexp_extract(F.col("m"), PAGE_LINKS_PATTERN, 2).alias("_at"),
        F.regexp_extract(F.col("m"), PAGE_LINKS_PATTERN, 3).alias("_bh"),
    ).select(
        "src", *(["_basetag"] if resolve else []),
        _unquote(F.when(F.col("_ah") != "", F.col("_ah"))
                 .otherwise(F.col("_bh"))).alias("href"),
        F.when(F.col("_ah") != "",
               F.trim(F.regexp_replace(F.col("_at"), r"\s+", " ")))
         .alias("anchor"))
    if not resolve:
        return out
    from .textops import resolve_href
    eff_base = F.when(F.col("_basetag") == "", F.col("src")) \
                .otherwise(resolve_href(F.col("src"), F.col("_basetag")))
    return (out.withColumn("resolved", resolve_href(eff_base, F.col("href")))
            .drop("_basetag"))


def anchor_pairs(df: DataFrame, id_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """One row per (page, href, anchor_text) — the raw material of an
    anchor-text index. Pure map: two JVM ``regexp_extract_all`` passes
    over the same pattern (Spark extracts one group per call) zipped
    positionally, so href and text always come from the SAME match.
    Anchor text is whitespace-normalized (trim + inner collapse);
    anchors wrapping nested markup don't match (see ANCHOR_PATTERN)."""
    h = F.col(html_col)
    hrefs = F.transform(
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), 1), _unquote)
    texts = F.transform(
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), 2),
        lambda t: F.trim(F.regexp_replace(t, r"\s+", " ")))
    return (df.select(F.col(id_col).alias("src"),
                      F.explode(F.arrays_zip(
                          hrefs.alias("href"), texts.alias("anchor")))
                       .alias("z"))
            .select("src", F.col("z.href").alias("href"),
                    F.col("z.anchor").alias("anchor")))


def anchor_text_index(df: DataFrame | None = None, id_col: str = "url",
                      html_col: str = "html", k: int = 3,
                      resolve: bool = True,
                      links: DataFrame | None = None) -> DataFrame:
    """Top-k anchor texts per link TARGET — the classic web-graph
    relevance signal (how the rest of the web describes a page), used
    for retrieval training data and page-title repair.

    Output: (dst, rank, anchor, n_refs) with rank 1..k per dst, ordered
    by (n_refs desc, anchor asc) — fully deterministic.

    ``links``: a pre-extracted ``page_links`` DataFrame (``resolved``,
    ``anchor`` columns) to build the index from WITHOUT re-lexing or
    re-resolving the pages — the shared-pass shape ``crawl_cycle``'s
    ``anchor_index=True`` uses (resolution was 97% of this operator's
    standalone wall at 400k pages). NULL anchors (non-anchor hrefs in
    the shared extraction) drop with the empties.

    Scale shape: the count aggregation shuffles (dst, anchor) string
    pairs only (never pages) with map-side partial combine; the top-k
    window partitions on dst — key cardinality ~unique targets, no
    single-reducer stage. Empty anchors ("" after normalization — image
    links) are dropped: they carry no signal and would otherwise
    dominate every popular target's top-k."""
    if df is None and links is None:
        raise ValueError(
            "anchor_text_index needs either `df` (pages) or `links` "
            "(a pre-extracted page_links DataFrame)")
    if links is not None:
        keyed = links.select(
            F.col("resolved" if resolve else "href").alias("dst"), "anchor")
    else:
        from .textops import resolve_href
        pairs = anchor_pairs(df, id_col, html_col)
        dst = (resolve_href(F.col("src"), F.col("href"))
               if resolve else F.col("href"))
        keyed = pairs.select(dst.alias("dst"), "anchor")
    keyed = keyed.filter(F.col("dst").rlike(r"^(?i:https?)://")
                         & F.col("anchor").isNotNull()
                         & (F.col("anchor") != ""))
    counts = keyed.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n_refs"))
    from pyspark.sql import Window
    w = Window.partitionBy("dst").orderBy(
        F.col("n_refs").desc(), F.col("anchor"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("dst", F.col("rank").cast("int").alias("rank"),
                    "anchor", F.col("n_refs").cast("bigint")
                    .alias("n_refs")))
