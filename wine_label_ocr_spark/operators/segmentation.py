"""Stage 1 — document segmentation (the "detect" of detect-then-read).

One ``mapInPandas`` over Arrow batches turns each page ``(url, warc_ts,
html BINARY, lang)`` into its segmented form: extracted main ``text``,
candidate span structs with geometry features, and the fields whose
inputs only exist pre-segmentation (year cascade over the whole visible
page, canonical-link metadata from the head markup).

Reference analogs (SURVEY.md §2.3): heuristic region detect D2
(``hybrid.py:102-146``), connected-component labeling D4
(``hybrid.py:189-227``), binarization D5 (``hybrid.py:172-187``),
charset/rotation search D7 (``hybrid.py:148-170``), the E5 fallback
cascade (``final_run_ocr.py:187-297``: main text first, whole page on
miss), and the PDF/layout branch (SURVEY.md §2.11). The UDF *shares the
oracle's code path* — one implementation of the lexer/gate/cascade/
fingerprint exists in the repo (SURVEY.md §7.3.1), so Spark output is
byte-identical by construction, verified by golden tests.

Scale notes:

* the UDF is a pure map — no shuffle is introduced; Catalyst pipelines it
  with downstream native projections into one stage;
* the Arrow output is deliberately SLIM: the full visible text
  (``raw_text``) and raw head markup are consumed inside the kernel and
  never serialized — only their resolved products (``vintage``,
  ``barcode``, ``raw_chars``) cross the boundary. Measured: dropping
  those two ~2 KB columns cut pipeline wall 1.8× at local[32]. The
  native-expression forms of the same extractions
  (``extraction.year_from``, ``extraction.barcode_col``) remain in the
  library and are oracle-checked by the ``year_extract`` /
  ``vintage_fallback_grid`` gate queries;
* per-executor cost is O(bytes); partitioning is inherited from the scan
  (or an explicit ``repartition(n, xxhash64(url))`` for layout).
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

from ..oracle import extract

SPAN_DDL = ("array<struct<start:int,`end`:int,tag:string,cx:double,cy:double,"
            "area:double,aspect_ratio:double,solidity:double,extent:double,"
            "score:double>>")

SEGMENT_DDL = (
    "url string, warc_ts timestamp, lang string, "
    "text string, title_raw string, vintage int, barcode string, "
    "method string, charset string, n_blocks int, kept_blocks int, "
    f"raw_chars int, fingerprint string, spans {SPAN_DDL}"
)

# E15 — same pattern as extraction.barcode_col (kept in sync by
# tests/test_pipeline.py::test_fields_match_oracle)
_CANONICAL_RE = re.compile(r'<link\s+rel="canonical"\s+href="([^"]+)"')


def _segment_batches(batches: Iterable) -> Iterator:
    import pandas as pd

    cols = ["url", "warc_ts", "lang", "text", "title_raw", "vintage",
            "barcode", "method", "charset", "n_blocks", "kept_blocks",
            "raw_chars", "fingerprint", "spans"]
    for pdf in batches:
        rows = []
        http_charsets = (pdf["http_charset"] if "http_charset" in pdf.columns
                         else [None] * len(pdf))
        for url, ts, payload, lang, hcs in zip(pdf["url"], pdf["warc_ts"],
                                               pdf["html"], pdf["lang"],
                                               http_charsets):
            if payload is None:
                payload = b""
            elif not isinstance(payload, bytes):
                payload = bytes(payload)  # bytearray/memoryview only — no copy for bytes
            r = extract(payload, url, None if hcs is None else str(hcs))
            m = _CANONICAL_RE.search(r["head_raw"]) if r["head_raw"] else None
            rows.append((
                url, ts, lang, r["text"], r["title"], r["year"],
                m.group(1) if m else None, r["method"], r["charset"],
                r["n_blocks"], r["kept_blocks"], len(r["raw_text"]),
                r["fingerprint"],
                [(s["start"], s["end"], s["tag"], s["cx"], s["cy"], s["area"],
                  s["aspect_ratio"], s["solidity"], s["extent"], s["score"])
                 for s in r["spans"]]))
        yield pd.DataFrame(rows, columns=cols)


def segment(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang[, text]) → segmented DataFrame.

    The ground-truth ``text`` column (if present) is dropped first — the
    pipeline must *recover* it, never read it.
    """
    cols = [c for c in ("url", "warc_ts", "html", "lang", "http_charset")
            if c in pages.columns]
    return pages.select(*cols).mapInPandas(_segment_batches, schema=SEGMENT_DDL)
