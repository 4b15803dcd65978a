"""Golden byte-identity tests: Spark pipeline vs. ground truth vs. oracle.

The north-rule gate (BASELINE.json): per-url extracted text from the Spark
pipeline must be byte-identical to the frozen oracle's output — which the
fixture generator guarantees equals the ground-truth ``text`` column.
"""

from __future__ import annotations

import pytest

from wine_label_ocr_spark import oracle
from wine_label_ocr_spark.fixtures import PAGES_DDL, make_page, pages_spark
from wine_label_ocr_spark.plans.pipeline import extract_records

N_PAGES = 400


@pytest.fixture(scope="module")
def records(spark):
    pages = pages_spark(spark, N_PAGES, partitions=4)
    return extract_records(pages).cache()


def test_text_byte_identity(records):
    got = {r["url"]: r["text"] for r in records.collect()}
    assert len(got) == N_PAGES
    for i in range(N_PAGES):
        p = make_page(i)
        assert got[p["url"]] == p["text"], (i, p["kind"], p["lang"])


def test_fields_match_oracle(records):
    rows = {r["url"]: r for r in records.collect()}
    for i in range(N_PAGES):
        p = make_page(i)
        o = oracle.extract(p["html"], p["url"])
        r = rows[p["url"]]
        assert r["vintage"] == o["year"], (i, p["kind"])
        assert r["maker_name"] == o["maker_name"], i
        assert r["custom_id"] == o["custom_id"], i
        assert r["rec_id"] == o["rec_id"], i
        assert r["fingerprint"] == o["fingerprint"], i
        assert r["barcode"] == p["canonical"], i


def test_spans_struct(records):
    row = records.filter("blob_data.blob_count > 0").first()
    spans = row["blob_data"]["spans"]
    assert len(spans) == row["blob_data"]["blob_count"]
    s0 = spans[0]
    assert s0["end"] > s0["start"] >= 0
    assert 0.0 <= s0["solidity"] <= 1.0
    # roi_bbox covers [first span start, last span end]
    assert row["blob_data"]["roi_bbox"] == [spans[0]["start"], spans[-1]["end"]]


def test_extract_plan_has_no_shuffle(records):
    """Scale property: the extract path is a pure map — no Exchange node."""
    plan = records._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_generation_is_partition_invariant(spark):
    """pages_spark yields identical rows at different parallelism (the
    precondition for the N-vs-4N scaling claim to be apples-to-apples)."""
    a = pages_spark(spark, 50, partitions=1).select("url", "text").collect()
    b = pages_spark(spark, 50, partitions=7).select("url", "text").collect()
    assert sorted((r["url"], r["text"]) for r in a) == \
        sorted((r["url"], r["text"]) for r in b)


def test_pages_schema_matches_input_hint(spark):
    df = pages_spark(spark, 5, partitions=1)
    assert [f.simpleString() for f in df.schema.fields] == [
        "url:string", "warc_ts:timestamp", "html:binary",
        "text:string", "lang:string"]
    assert PAGES_DDL.startswith("url string")


def test_raw_candidate_buckets(records):
    """FIXTURES.md §2 `raw` column — MAP<bucket, ARRAY<STRUCT<text,conf>>>,
    the ocr_raw analog (final_run_ocr.py:325-340)."""
    row = records.filter("vintage is not null and blob_data.blob_count > 0").first()
    raw = row["raw"]
    assert set(raw.keys()) == {"title", "year_candidates", "blocks"}
    assert raw["title"][0]["conf"] == 1.0
    assert any(c["text"] == str(row["vintage"]) for c in raw["year_candidates"]) \
        or raw["year_candidates"] == []  # year may come from the raw_text fallback
    assert all(0.0 <= b["conf"] <= 1.1 for b in raw["blocks"])
    assert row["text"].startswith(raw["blocks"][0]["text"][:10])


def test_best_maker_from_raw(spark):
    """E9 — pooled-candidate argmax mirrors _extract_best_maker_from_raw
    (final_run_ocr.py:361-373): reserved buckets skipped, len>=3 / '.'
    gate, normalize, longest wins with FIRST-wins tie-break."""
    from pyspark.sql import functions as F
    from wine_label_ocr_spark.operators.extraction import best_maker_from_raw
    ddl = "raw map<string, array<struct<text:string, conf:double>>>"
    mk = lambda *ts: [{"text": t, "conf": 1.0} for t in ts]  # noqa: E731
    rows = [
        # named bucket first; "ZZ" gated (len<3); "." gated; ties: first wins
        ({"maker_name_candidates": mk("opus one"),
          "vintage_candidates": mk("SHOULD NOT APPEAR EVER"),
          "blocks": mk("ZZ", ".", "chateau margaux", "ABCDEFGH MARGAUX")},),
        # normalization may shrink a longer raw string below a shorter one
        ({"maker_name_candidates": mk("aaa bbb"),
          "blocks": mk("@@@@@@@@@@@@@@@@x!")},),
        ({"maker_name_candidates": [], "blocks": mk("ZZ", ".")},),
        # the len>=3 gate applies ONLY to non-reserved buckets — a 1-2 char
        # maker_name candidate survives on truthiness alone
        # (final_run_ocr.py:362 keeps `txt` with no length check)
        ({"maker_name_candidates": mk("AB"), "blocks": mk("ZZ", ".")},),
    ]
    df = spark.createDataFrame(rows, ddl)
    got = [r["best"] for r in
           df.select(best_maker_from_raw(F.col("raw")).alias("best")).collect()]
    # row 1: "CHATEAU MARGAUX" and "ABCDEFGH MARGAUX" both 15/16 chars;
    # ABCDEFGH MARGAUX is longer (16) -> wins; reserved bucket excluded
    assert got[0] == "ABCDEFGH MARGAUX"
    # row 2: "@...x!" normalizes to "X" (len 1) -> "AAA BBB" wins
    assert got[1] == "AAA BBB"
    # row 3: everything gated -> NULL
    assert got[2] is None
    # row 4: short named candidate kept (reference parity)
    assert got[3] == "AB"
