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
# the DuckDB oracle. Captures the quoted value of href= inside <a ...>.
HREF_PATTERN = r"<[aA][^>]*\s(?i:href)\s*=\s*[\"']([^\"'#][^\"']*)[\"']"

PR_SCALE = 1_000_000_000_000  # 10^12: rank mass in integer micro-units


def extract_outlinks(df: DataFrame, id_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """One row per (page, outlink href) — raw hrefs as written (no
    resolution; feed absolute links to ``textops.canonical_url`` and
    relative ones to a base-join downstream). Pure map, JVM regex."""
    return (df.select(F.col(id_col).alias("src"),
                      F.explode(F.regexp_extract_all(
                          F.col(html_col), F.lit(HREF_PATTERN), 1))
                      .alias("href")))


def host_edges(links: DataFrame, src_col: str = "src",
               href_col: str = "href") -> DataFrame:
    """Distinct (src_host, dst_host) edges from absolute http(s)
    outlinks (relative links have no host and drop out). Hosts are
    normalized via ``registrable_host`` (lowercase, userinfo/port
    stripped) so ``a.com`` and ``a.com:8080`` are ONE PageRank node —
    split authorities would silently dilute rank mass. Self-edges are
    kept; PageRank handles them like any other edge."""
    from .textops import registrable_host
    return (links.select(registrable_host(F.col(src_col)).alias("src_host"),
                         registrable_host(F.col(href_col)).alias("dst_host"))
            .filter(F.col("src_host").isNotNull()
                    & F.col("dst_host").isNotNull())
            .distinct())


def pagerank(edges: DataFrame, n_iters: int = 5, damping_pct: int = 85,
             src_col: str = "src_host", dst_col: str = "dst_host") -> DataFrame:
    """Exact fixed-point PageRank over a distinct edge list:
    ``(host, rank_scaled)`` with rank in integer units of ``PR_SCALE``.

    All arithmetic is bigint floor math — ``r/deg`` and the damping are
    integer divisions — so the result is EXACTLY reproducible across
    engines, partitionings, and cluster sizes (the driver gate hashes it
    against a DuckDB recursive-CTE twin; float PageRank cannot pass such
    a gate). Dangling hosts (in-links only) receive the teleport term
    but contribute nothing — their outflow mass simply leaves the
    system, the standard simplification when ranks are used as a
    relative quality prior rather than a probability distribution.

    Per iteration: one dst-keyed aggregation of ``share = r // deg``
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
                          F.try_divide(F.col("rank_scaled"), F.col("deg"))
                          .cast("bigint").alias("share")))
        inflow = shares.groupBy("host").agg(
            F.sum("share").cast("bigint").alias("inflow"))
        ranks = (nodes.join(inflow, "host", "left")
                 .select("host",
                         (F.lit(teleport)
                          + (F.lit(damping_pct)
                             * F.coalesce(F.col("inflow"), F.lit(0))) / 100)
                         .cast("bigint").alias("rank_scaled"))
                 .localCheckpoint(eager=True))
    return ranks
