"""Tests for crawl-frontier scheduling (operators/frontier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wine_label_ocr_spark.operators.frontier import schedule_frontier


def test_schedule_politeness_spacing_and_workers(spark):
    urls = spark.createDataFrame(
        [(f"https://a.com/p/{i}",) for i in range(4)]
        + [(f"https://B.com:443/q/{i}",) for i in range(3)]
        + [("mailto:x@y.z",), ("notaurl",)],
        "url string")
    delays = spark.createDataFrame([("a.com", 2000)],
                                   "host string, delay_ms bigint")
    rows = schedule_frontier(urls, delays, default_delay_ms=500,
                             n_workers=4).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    # unfetchable rows dropped; port stripped into the same authority
    assert set(by_host) == {"a.com", "b.com"}
    a = sorted(by_host["a.com"], key=lambda r: r["seq"])
    assert [r["seq"] for r in a] == [1, 2, 3, 4]
    assert [r["fetch_offset_ms"] for r in a] == [0, 2000, 4000, 6000]
    assert len({r["worker"] for r in a}) == 1       # host-sticky
    b = sorted(by_host["b.com"], key=lambda r: r["seq"])
    assert [r["fetch_offset_ms"] for r in b] == [0, 500, 1000]  # default
    assert all(0 <= r["worker"] < 4 for r in rows)
    # deterministic replan
    again = schedule_frontier(urls, delays, default_delay_ms=500,
                              n_workers=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_schedule_no_delay_table_and_flavors(spark):
    urls = spark.createDataFrame(
        [("https://h.com/1",), ("https://h.com/2",)], "url string")
    out = schedule_frontier(urls).collect()
    assert [r["delay_ms"] for r in sorted(out, key=lambda r: r["seq"])] \
        == [1000, 1000]
    # oracle_safe flavor changes only the worker hash, nothing else
    fast = {r["url"]: (r["seq"], r["delay_ms"], r["fetch_offset_ms"])
            for r in out}
    safe = {r["url"]: (r["seq"], r["delay_ms"], r["fetch_offset_ms"])
            for r in schedule_frontier(urls, oracle_safe=True).collect()}
    assert fast == safe


def test_delay_table_normalized_and_duplicates_resolve_polite(spark):
    # ported/userinfo'd delay keys still govern; conflicting rows take
    # the MAX delay (the polite direction) instead of fanning out
    urls = spark.createDataFrame(
        [("https://h.com/1",), ("https://h.com/2",),
         ("https://u.com/1",)], "url string")
    delays = spark.createDataFrame(
        [("H.com:8080", 3000), ("h.com", 1000), ("bob@u.com", 700)],
        "host string, delay_ms bigint")
    rows = schedule_frontier(urls, delays).collect()
    assert len(rows) == 3                    # no join fan-out
    h = sorted((r for r in rows if r["host"] == "h.com"),
               key=lambda r: r["seq"])
    assert [r["delay_ms"] for r in h] == [3000, 3000]
    assert [r["fetch_offset_ms"] for r in h] == [0, 3000]
    u = [r for r in rows if r["host"] == "u.com"][0]
    assert u["delay_ms"] == 700


def test_prioritized_frontier_budget_and_order(spark):
    from pyspark.sql import functions as F

    from wine_label_ocr_spark.operators.frontier import prioritized_frontier

    urls = spark.createDataFrame(
        [(f"https://{h}.com/p{i}",) for h in ("big", "mid", "unk")
         for i in range(4)], "url string")
    ranks = spark.createDataFrame(
        [("big.com", 900), ("mid.com", 500)], "host string, rank_scaled long")
    out = prioritized_frontier(urls, ranks, budget=6, n_workers=4).collect()
    assert len(out) == 6
    got = {r["url"]: r for r in out}
    # all 4 big.com (rank 900) + first 2 mid.com by url asc
    assert {u for u in got} == (
        {f"https://big.com/p{i}" for i in range(4)}
        | {"https://mid.com/p0", "https://mid.com/p1"})
    # priority column carried; unknown hosts rank 0 and lose
    assert all(got[u]["priority"] == 900 for u in got if "big" in u)
    # per-host politeness schedule intact over the selected set
    seqs = sorted(r["seq"] for r in out if r["host"] == "big.com")
    assert seqs == [1, 2, 3, 4]
    offs = {r["seq"]: r["fetch_offset_ms"] for r in out
            if r["host"] == "big.com"}
    assert offs == {1: 0, 2: 1000, 3: 2000, 4: 3000}
    # budget >= candidates: everything schedules, unknown hosts last
    all12 = prioritized_frontier(urls, ranks, budget=100, n_workers=4)
    assert all12.count() == 12
    assert all12.filter("host = 'unk.com'").count() == 4
