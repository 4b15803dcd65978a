"""Tests for text-analysis operators (documents table, sf0.001)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wine_label_ocr_spark.operators import textops as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_token_counts(spark, docs):
    row = (docs.limit(50)
           .select("text", T.token_count(F.col("text")).alias("n"),
                   T.bpe_ish_token_count(F.col("text")).alias("nb"))
           ).collect()
    for r in row:
        assert r["n"] == len(r["text"].split())
        assert r["nb"] >= r["n"]  # BPE-ish splits punctuation off


def test_token_count_empty(spark):
    df = spark.createDataFrame([("",), ("   ",), ("one two",)], "text string")
    out = [r["n"] for r in df.select(T.token_count(F.col("text")).alias("n")).collect()]
    assert out == [0, 0, 2]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame([
        ("good", "The quick brown fox jumps over the lazy dog and runs far "
                 "into the quiet woods where the evening light is soft." * 3),
        ("junk", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        ("short", "hi"),
    ], "name string, text string")
    out = {r["name"]: r for r in df.select(
        "name", T.quality_score(F.col("text")).alias("q"),
        T.quality_gate(F.col("text")).alias("ok")).collect()}
    assert out["good"]["q"] > out["junk"]["q"]
    assert out["good"]["ok"] and not out["junk"]["ok"] and not out["short"]["ok"]


def test_lang_id(spark):
    df = spark.createDataFrame([
        ("en", "the cat sat on the mat and it is you that for"),
        ("fr", "le chat est sur la table et les de des que"),
        ("de", "der hund und die katze von den zu mit ist im"),
        ("es", "el perro y la gata de los las que en un por"),
        ("und", "zzz qqq xxx"),
    ], "expected string, text string")
    out = df.select("expected", T.lang_id(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], (r["expected"], r["got"])


def test_doc_fingerprint_deterministic(spark, docs):
    a = docs.select("doc_id", T.doc_fingerprint(F.col("text")).alias("fp"))
    b = docs.select("doc_id", T.doc_fingerprint(F.col("text")).alias("fp"))
    assert a.collect() == b.collect()
    # different texts → (almost certainly) different fingerprints
    n_distinct = a.select("fp").distinct().count()
    assert n_distinct > 0.95 * a.count()


def test_text_profile_schema(spark, docs):
    out = T.text_profile(docs.limit(10))
    assert {"n_tokens", "n_bpe_tokens", "alpha_ratio", "quality",
            "quality_ok", "lang_pred", "content_fp"} <= set(out.columns)
    assert out.count() == 10
