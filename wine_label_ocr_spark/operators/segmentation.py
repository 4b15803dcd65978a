"""Stage 1 — document segmentation (the "detect" of detect-then-read).

One ``mapInPandas`` over Arrow batches turns each page ``(url, warc_ts,
html BINARY, lang)`` into its segmented form: extracted main ``text``,
candidate span structs with geometry features, and raw candidates for the
stage-2 fallback cascade.

Reference analogs (SURVEY.md §2.3): heuristic region detect D2
(``hybrid.py:102-146``), connected-component labeling D4
(``hybrid.py:189-227``), binarization D5 (``hybrid.py:172-187``),
charset/rotation search D7 (``hybrid.py:148-170``), PDF/layout branch
(SURVEY.md §2.11). The UDF *shares the oracle's code path* — one
implementation of the lexer/gate/fingerprint exists in the repo
(SURVEY.md §7.3.1), so Spark output is byte-identical by construction,
verified by golden tests.

Scale notes:

* the UDF is a pure map — no shuffle is introduced; Catalyst pipelines it
  with downstream native projections into one stage;
* per-executor cost is O(bytes); partitioning is inherited from the scan
  (or from an explicit ``repartition(n, xxhash64(url))`` for layout);
* only needed output columns survive — stage-2 drops ``raw_text`` after
  the fallback extraction, and column pruning removes it from any plan
  that doesn't use it.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

from pyspark.sql import DataFrame

from ..oracle import extract

SPAN_DDL = ("array<struct<start:int,`end`:int,tag:string,cx:double,cy:double,"
            "area:double,aspect_ratio:double,solidity:double,extent:double,"
            "score:double>>")

SEGMENT_DDL = (
    "url string, warc_ts timestamp, lang string, "
    "text string, title_raw string, raw_text string, head_raw string, "
    "method string, charset string, n_blocks int, kept_blocks int, "
    f"fingerprint string, spans {SPAN_DDL}"
)


def _segment_batches(batches: Iterable) -> Iterator:
    import pandas as pd

    for pdf in batches:
        out = {k: [] for k in (
            "url", "warc_ts", "lang", "text", "title_raw", "raw_text",
            "head_raw", "method", "charset", "n_blocks", "kept_blocks",
            "fingerprint", "spans")}
        htmls = pdf["html"].values
        urls = pdf["url"].values
        for j in range(len(pdf)):
            payload = htmls[j]
            payload = bytes(payload) if payload is not None else b""
            r = extract(payload, urls[j])
            out["url"].append(urls[j])
            out["text"].append(r["text"])
            out["title_raw"].append(r["title"])
            out["raw_text"].append(r["raw_text"])
            out["head_raw"].append(
                payload[:2048].decode(r["charset"], "replace")
                if r["method"] == "html" else "")
            out["method"].append(r["method"])
            out["charset"].append(r["charset"])
            out["n_blocks"].append(r["n_blocks"])
            out["kept_blocks"].append(r["kept_blocks"])
            out["fingerprint"].append(r["fingerprint"])
            out["spans"].append([
                (s["start"], s["end"], s["tag"], s["cx"], s["cy"], s["area"],
                 s["aspect_ratio"], s["solidity"], s["extent"], s["score"])
                for s in r["spans"]])
        out["warc_ts"] = list(pdf["warc_ts"].values)
        out["lang"] = list(pdf["lang"].values)
        yield pd.DataFrame(out)


def segment(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang[, text]) → segmented DataFrame.

    The ground-truth ``text`` column (if present) is dropped first — the
    pipeline must *recover* it, never read it.
    """
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in pages.columns]
    return pages.select(*cols).mapInPandas(_segment_batches, schema=SEGMENT_DDL)
