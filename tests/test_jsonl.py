"""JSONL store scan semantics (S1/S2/P8/P10) vs the reference's behavior."""

from __future__ import annotations

import json

from wine_label_ocr_spark.sources.jsonl import load_database, load_db_txt, repair_fields


def test_last_write_wins(spark, tmp_path):
    # hybrid.py:54-64 — later lines overwrite earlier dict entries
    p = tmp_path / "db.jsonl"
    lines = [
        {"wine_id": "a", "MakerName": "OLD", "Vintage": 2001, "timestamp": 1.0},
        {"wine_id": "b", "MakerName": "KEEP", "Vintage": 2002, "timestamp": 2.0},
        {"wine_id": "a", "MakerName": "NEW", "Vintage": 2003, "timestamp": 3.0},
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n# comment\n\n")
    out = {r["wine_id"]: r for r in load_database(spark, str(p)).collect()}
    assert len(out) == 2
    assert out["a"]["MakerName"] == "NEW" and out["a"]["Vintage"] == 2003
    assert out["b"]["MakerName"] == "KEEP"


def test_txt_key_scan_and_empty_guard(spark, tmp_path):
    # scan_and_store.py:88-97 + empty-key guard :199-209
    p = tmp_path / "keys.txt"
    p.write_text("OPUS ONE|2018\n# comment\n\nMARGAUX|\n|\nBADYEAR|20x8\n|2001\n")
    rows = {(r["maker_name"], r["vintage"])
            for r in load_db_txt(spark, str(p)).collect()}
    assert ("OPUS ONE", 2018) in rows
    assert ("MARGAUX", None) in rows          # maker only: kept
    assert (None, 2001) in rows               # vintage only: kept
    assert ("BADYEAR", None) in rows          # bad year → NULL vintage
    assert not any(m is None and v is None for m, v in rows)  # '|' rejected


def test_repair_fields(spark):
    df = spark.createDataFrame(
        [(None, "OPUS ONE", 2018), ("X|1999", "X", 1999), (None, None, 2000)],
        "CustomID string, MakerName string, Vintage int")
    out = {r["MakerName"]: r["CustomID"] for r in repair_fields(df).collect()}
    assert out["OPUS ONE"] == "OPUS ONE|2018"  # rebuilt (scan_and_store.py:99-105)
    assert out["X"] == "X|1999"                # untouched
    assert out[None] is None                   # cannot rebuild
