"""Unit tests for the frozen oracle extractor (pure Python, no Spark)."""

from __future__ import annotations

import pytest

from wine_label_ocr_spark import oracle
from wine_label_ocr_spark.fixtures import make_page


def test_byte_identity_over_fixture_corpus():
    """The north-rule gate at the pure-Python level: the oracle recovers the
    generator's ground-truth text/title/year exactly, across all page kinds
    (html / pdf / degraded / latin-1)."""
    kinds = set()
    for i in range(1500):
        p = make_page(i)
        r = oracle.extract(p["html"], p["url"])
        assert r["text"] == p["text"], (i, p["kind"])
        assert r["title"] == p["title"], (i, p["kind"])
        assert r["year"] == p["year"], (i, p["kind"])
        kinds.add(p["kind"])
    assert kinds == {"html", "pdf", "degraded"}


def test_normalize_maker_reference_semantics():
    # _normalize_maker (final_run_ocr.py:353-359): upper, whitelist, collapse
    assert oracle.normalize_maker("  Opus   One ") == "OPUS ONE"
    assert oracle.normalize_maker("Château Margaux") == "CHTEAU MARGAUX"
    assert oracle.normalize_maker("a&b's-c.d,e!") == "A&B'S-CDE"
    assert oracle.normalize_maker("") is None
    assert oracle.normalize_maker("...") is None
    assert oracle.normalize_maker(None) is None


def test_normalize_maker_idempotent():
    # property from SURVEY.md §5.4: E7 ∘ E7 = E7
    for s in ["Opus One", "château &  co", "A  B   C", "x-y'z"]:
        once = oracle.normalize_maker(s)
        assert oracle.normalize_maker(once) == once


def test_extract_year_ordered_patterns():
    # labeled contexts beat bare years (final_run_ocr.py:166-175 priority)
    assert oracle.extract_year("call 2200 tomorrow, vintage 2015, born 1985") == 2015
    assert oracle.extract_year("born 1985 and vintage 2015") == 2015
    assert oracle.extract_year("just 1985 and later 2012") == 1985
    assert oracle.extract_year("© 2019 somewhere") == 2019
    assert oracle.extract_year("Copyright: 2007") == 2007
    # range check 1900-2030 (final_run_ocr.py:161)
    assert oracle.extract_year("year 1899") is None
    assert oracle.extract_year("year 2031") is None
    assert oracle.extract_year("year 1900 ok") == 1900
    # digits glued to the year don't count (no partial matches)
    assert oracle.extract_year("id 12019 x") is None
    assert oracle.extract_year("") is None


def test_fingerprint_sorted_and_pinned():
    # W1: fingerprint is invariant under span reordering (hybrid.py:234)
    spans = [
        {"start": 10, "end": 20, "cx": 0.5, "cy": 0.1, "area": 10.0,
         "aspect_ratio": 4.0, "solidity": 0.8, "extent": 1.0},
        {"start": 0, "end": 8, "cx": 0.0, "cy": 0.0, "area": 8.0,
         "aspect_ratio": 3.5, "solidity": 0.9, "extent": 1.0},
    ]
    f1 = oracle.fingerprint_spans(spans)
    f2 = oracle.fingerprint_spans(list(reversed(spans)))
    assert f1 == f2
    assert len(f1) == 16
    assert oracle.fingerprint_spans([]) == "empty"


def test_rec_id_shape():
    assert oracle.rec_id("OPUS ONE|2018") == oracle.rec_id("OPUS ONE|2018")
    assert len(oracle.rec_id("x")) == 12


def test_charset_detection():
    assert oracle.detect_charset(b'<meta charset="utf-8">') == "utf-8"
    assert oracle.detect_charset(b'<meta charset="iso-8859-1">') == "latin-1"
    assert oracle.detect_charset("é".encode()) == "utf-8"
    assert oracle.detect_charset("é".encode("latin-1")) == "latin-1"


def test_boilerplate_dropped():
    html = (b"<html><head><title>T</title></head><body>"
            b"<nav><ul><li><a href='/'>Home is where the heart is and more</a>"
            b"</li></ul></nav>"
            b"<p>" + b"word " * 40 + b"end.</p>"
            b"<footer><p>Long footer sentence that would otherwise pass every "
            b"length gate easily.</p></footer></body></html>")
    r = oracle.extract(html, "u")
    assert r["text"].startswith("word word")
    assert "footer" not in r["text"]
    assert "Home" not in r["text"]


def test_link_farm_dropped_outside_boiler_container():
    html = (b"<html><body><div><ul>"
            b"<li><a href='/a'>a reasonably long anchor text line here</a></li>"
            b"<li><a href='/b'>another reasonably long anchor text item</a></li>"
            b"</ul></div><p>" + b"content " * 30 + b"tail.</p></body></html>")
    r = oracle.extract(html, "u")
    assert "anchor" not in r["text"]
    assert r["text"].startswith("content")


def test_pdf_branch_same_span_schema():
    from wine_label_ocr_spark.fixtures import _make_pdf
    pdf = _make_pdf(["first paragraph body of the pdf page with many words",
                     "second (escaped) paragraph \\ with specials"], "Tît le")
    r = oracle.extract(pdf, "u")
    assert r["method"] == "pdf"
    assert r["title"] == "Tît le"
    assert "second (escaped) paragraph \\ with specials" in r["text"]
    assert r["spans"] and set(r["spans"][0]) >= {
        "start", "end", "cx", "cy", "area", "aspect_ratio", "solidity", "extent"}


@pytest.mark.parametrize("payload", [b"", b"<", b"%PDF-", b"\x00\xff\xfe",
                                     b"<html><body><p>tiny</p>"])
def test_never_raises_on_garbage(payload):
    r = oracle.extract(payload, "u")
    assert isinstance(r["text"], str)


@pytest.mark.parametrize("flavor", [0, 1, 2, 3, 4, 5, 6])
def test_pdf_flavors_round_trip(flavor):
    """Every content-stream encoding _make_pdf emits (uncompressed Tj,
    FlateDecode, TJ arrays, hex strings, '/" shows, ASCII85+Flate,
    ASCIIHex transport) must round-trip the paragraphs and title
    exactly."""
    from wine_label_ocr_spark.fixtures import _make_pdf
    paras = ["Chateau d'Exemple grand cru 2015 réserve spéciale",
             "body with (nested (parens)) and \\ a backslash",
             "singleword"]
    title = "PDF DOC 42 — tëst"
    r = oracle.extract(_make_pdf(paras, title, flavor=flavor), "u")
    assert r["method"] == "pdf"
    assert r["title"] == title
    assert r["text"] == "\n\n".join(paras)


def test_pdf_tj_kern_threshold():
    """TJ adjustments at/below -180 are word gaps; above, letter kerns."""
    body = b"BT [ (wo) -50 (rd) -180 (next) -179.9 (glued) ] TJ ET"
    assert oracle._pdf_piece_paragraphs(body) == ["word nextglued"]


def test_pdf_show_ops_and_hex():
    body = (b"BT (a) Tj (b) ' 1 2 (c) \" "
            b"<4 8656C6C6F> Tj [ <77> -300 (x) ] TJ ET")
    assert oracle._pdf_piece_paragraphs(body) == ["a b c Hello w x"]


def test_pdf_literal_escapes():
    # octal (1-3 digits), \n \r \t, line continuation, escaped delimiters
    raw = rb"A\101\12B\n\(x\)\\ y\
z"
    assert oracle._pdf_str_bytes(raw) == b"AA\nB\n(x)\\ yz"


def test_pdf_utf16_title_and_odd_hex():
    assert oracle._pdf_unhex(b"FEFF004100E9") == "Aé"
    assert oracle._pdf_unhex(b"48 65 6C 6C 6F 2") == "Hello "  # odd → pad 0
    assert oracle._pdf_unhex(b"zz") == ""  # non-hex garbage → empty


def test_pdf_inflate_cap_and_corrupt_stream():
    """A zip bomb inflates only to the cap; corrupt Flate data without a
    BT is skipped; neither raises."""
    import zlib
    bomb = zlib.compress(b"BT (x) Tj ET " + b"\x00" * 64_000_000)
    payload = b"%PDF-1.4\nstream\n" + bomb + b"\nendstream\n"
    r = oracle.extract(payload, "u")
    assert r["text"] == "x"
    corrupt = b"%PDF-1.4\nstream\n\x78\x9c\xff\xff\xff\nendstream\nBT (ok) Tj ET\n"
    assert oracle.extract(corrupt, "u")["text"] == "ok"


def test_pdf_truncated_garbage_linear():
    """Truncated strings/blocks and pathological inputs stay linear and
    never raise (the backtracking-regex regression class)."""
    import time
    cases = [
        b"%PDF-1.4\nBT (never closed",
        b"%PDF-1.4\nBT [ (a) -250 (b " + b"\\" * 5000,
        b"%PDF-1.4\nBT " + b"((((" * 2000,
        b"%PDF-1.4\n" + b"BT " * 3000,
        b"%PDF-1.4\nBT <" + b"4" * 9999,
        b"%PDF-1.4\nstream\n" + b"\x9c" * 50000 + b"BT (t) Tj ET endstream",
    ]
    t0 = time.monotonic()
    for payload in cases:
        r = oracle.extract(payload, "u")
        assert isinstance(r["text"], str)
    assert time.monotonic() - t0 < 5.0


def test_pdf_ascii_filter_chains():
    """ASCIIHex / ASCII85 stream probes: charset-strict (raw content
    streams never false-fire), terminator-required, odd hex padded."""
    import base64
    import zlib
    body = b"BT (deep) Tj ET"
    a85 = base64.a85encode(zlib.compress(body)) + b"~>"
    payload = b"%PDF-1.4\nstream\n" + a85 + b"\nendstream\n"
    assert oracle.extract(payload, "u")["text"] == "deep"
    hx = body.hex().upper().encode() + b">"
    payload = b"%PDF-1.4\nstream\n" + hx + b"\nendstream\n"
    assert oracle.extract(payload, "u")["text"] == "deep"
    # raw uncompressed body still scanned directly (no false codec fire)
    payload = b"%PDF-1.4\nstream\n" + body + b"\nendstream\n"
    assert oracle.extract(payload, "u")["text"] == "deep"
    # a85 garbage with terminator but invalid grouping → skipped, no raise
    payload = b"%PDF-1.4\nstream\nuuuuu~>\nendstream\nBT (ok) Tj ET"
    assert oracle.extract(payload, "u")["text"] == "ok"


def test_pdf_et_inside_string_not_a_terminator():
    """r10 ADVICE fix: a standalone `ET` (or `BT`) token INSIDE a shown
    literal string must not truncate or open a text object — BT/ET are
    recognized at the token level, not by a byte-regex."""
    from wine_label_ocr_spark.fixtures import _make_pdf
    for flavor in range(7):
        p = _make_pdf(["WINE ET CHEESE pairing notes"], "t", flavor=flavor)
        assert oracle.extract(p, "u")["text"] == \
            "WINE ET CHEESE pairing notes", flavor
    # BT inside a string between blocks must not open a bogus block
    body = b"%PDF-1.4\n( BT junk ET ) BT (real) Tj ET"
    assert oracle.extract(body, "u")["text"] == "real"
    # truncated block (no closing ET) still yields nothing, as before
    body2 = b"%PDF-1.4\nBT (lost) Tj"
    assert oracle.extract(body2, "u")["text"] == ""


def test_pdf_raw_body_scanned_when_decode_lacks_bt():
    """r10 ADVICE fix: when a codec probe 'succeeds' on a body that was
    really raw text (garbage decode with no BT), the raw body is scanned
    as well, so the real text object is not shadowed."""
    # an all-A85-charset raw body ending in ~> : a85decode succeeds and
    # yields garbage without BT; the raw bytes carry the real block
    raw = b"BT (kept) Tj ET ~>"
    body = b"%PDF-1.4\nstream\n" + raw + b"\nendstream"
    assert oracle.extract(body, "u")["text"] == "kept"
