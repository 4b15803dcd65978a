"""Tests for link-graph operators (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wine_label_ocr_spark.operators import graph as G


def test_extract_outlinks_shapes(spark):
    html = ('<p>x</p><a href="https://b.com/x">l</a>'
            "<A HREF='https://c.com/'>z</A>"
            '<a class="k" href="https://d.com/p?q=1">m</a>'
            '<a name="n">no href</a><a href="#frag">skip</a>'
            '<a href="/rel/1">rel</a>')
    df = spark.createDataFrame([("u1", html), ("u2", "<p>no links</p>")],
                               "url string, html string")
    got = sorted((r["src"], r["href"])
                 for r in G.extract_outlinks(df).collect())
    assert got == [("u1", "/rel/1"), ("u1", "https://b.com/x"),
                   ("u1", "https://c.com/"), ("u1", "https://d.com/p?q=1")]
    # pure map: zero Exchange
    plan = G.extract_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_edges_and_pagerank_exact(spark):
    links = spark.createDataFrame(
        [("https://A.com/1", "https://b.com/x"),
         ("https://a.com/2", "https://b.com/y"),     # same host edge -> distinct
         ("https://a.com/1", "https://c.com/"),
         ("https://b.com/1", "https://c.com/z"),
         ("https://c.com/9", "https://a.com/"),
         ("https://c.com/9", "/relative/skip"),
         ("notaurl", "https://x.com/")],
        "src string, href string")
    edges = G.host_edges(links)
    got = sorted((r["src_host"], r["dst_host"]) for r in edges.collect())
    assert got == [("a.com", "b.com"), ("a.com", "c.com"),
                   ("b.com", "c.com"), ("c.com", "a.com")]

    # exact fixed-point ranks == pure-python reference, any iteration count
    for k in (1, 5):
        out = {r["host"]: r["rank_scaled"]
               for r in G.pagerank(edges, n_iters=k).collect()}
        SCALE, n = G.PR_SCALE, 3
        base, tel = SCALE // n, (SCALE * 15) // 100 // n
        deg = {"a.com": 2, "b.com": 1, "c.com": 1}
        ine = {"b.com": ["a.com"], "c.com": ["a.com", "b.com"],
               "a.com": ["c.com"]}
        r = dict.fromkeys(deg, base)
        for _ in range(k):
            r = {h: tel + (85 * sum(r[s] // deg[s] for s in ine[h])) // 100
                 for h in r}
        assert out == r, k
    # total mass conserved-ish and deterministic across reruns
    again = {r["host"]: r["rank_scaled"]
             for r in G.pagerank(edges, n_iters=5).collect()}
    assert again == out


def test_pagerank_dangling_and_empty(spark):
    # dangling sink: d has no out-edges; it accumulates but leaks its mass
    edges = spark.createDataFrame([("a", "d"), ("d2", "a")][:1] +
                                  [("b", "d"), ("c", "a")],
                                  "src_host string, dst_host string")
    out = {r["host"]: r["rank_scaled"]
           for r in G.pagerank(edges, n_iters=3).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert out["d"] > out["b"]  # two in-edges beat zero

    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert G.pagerank(empty, n_iters=2).count() == 0
