"""Property-based tests (hypothesis) — SURVEY.md §5.4.

Pure-Python properties of the frozen kernels; no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wine_label_ocr_spark import oracle
from wine_label_ocr_spark.operators import similarity as S

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=120)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_normalize_maker_idempotent(s):
    once = oracle.normalize_maker(s)
    assert oracle.normalize_maker(once) == once


@given(text_st, text_st)
@settings(max_examples=200, deadline=None)
def test_similarity_symmetric_and_bounded(a, b):
    x = S.strings_similar_score(a, b)
    assert x == S.strings_similar_score(b, a)
    assert 0.0 <= x <= 100.0


@given(text_st, text_st)
@settings(max_examples=200, deadline=None)
def test_indel_ratio_identity_of_indiscernibles(a, b):
    """_ratio == 100 iff the strings are equal: 2·LCS = |a|+|b| forces
    |a| = |b| = LCS, i.e. equality — a property difflib's block-matching
    ratio does NOT guarantee under junk heuristics."""
    assert (S._ratio(a, b) == 100.0) == (a == b)


@given(text_st)
@settings(max_examples=100, deadline=None)
def test_similarity_reflexive_after_normalization(s):
    if S.normalize_for_match(s):
        assert S.strings_similar_score(s, s) == 100.0


@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(1, 500),
                          st.floats(0, 1, allow_nan=False),
                          st.floats(0, 1, allow_nan=False)),
                min_size=0, max_size=12))
@settings(max_examples=100, deadline=None)
def test_fingerprint_order_invariant(items):
    spans = [{"start": a, "end": a + ln, "cx": c, "cy": d,
              "area": float(ln), "aspect_ratio": 4.2,
              "solidity": c, "extent": d} for a, ln, c, d in items]
    f1 = oracle.fingerprint_spans(spans)
    f2 = oracle.fingerprint_spans(list(reversed(spans)))
    assert f1 == f2


@given(st.binary(max_size=4096))
@settings(max_examples=150, deadline=None)
def test_extract_total_on_arbitrary_bytes(payload):
    # ST8 analog: tolerant parsing must never raise on any payload
    r = oracle.extract(payload, "u")
    assert isinstance(r["text"], str)
    assert r["fingerprint"] == "empty" or len(r["fingerprint"]) == 16


@given(text_st)
@settings(max_examples=150, deadline=None)
def test_year_extraction_in_range(s):
    y = oracle.extract_year(s)
    assert y is None or 1900 <= y <= 2030


@given(st.lists(st.binary(min_size=0, max_size=300), max_size=8))
@settings(max_examples=120, deadline=None)
def test_gzip_members_roundtrip_and_tolerance(payloads):
    """Concatenated per-record gzip members (the .warc.gz layout) inflate
    back to the exact concatenation; truncating the stream anywhere never
    raises and yields a prefix of the original bytes."""
    from wine_label_ocr_spark.sources.warc import gunzip_members, gzip_member
    blob = b"".join(gzip_member(p) for p in payloads)
    whole = b"".join(payloads)
    assert gunzip_members(blob) == whole
    if blob:
        cut = gunzip_members(blob[:len(blob) // 2])
        assert whole.startswith(cut)


@given(st.integers(1, 4), st.integers(1, 12), st.integers(1, 12),
       st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(c, h, w, seed):
    """encode→decode is the identity for arbitrary shapes/content under
    the default filter cycle (exercises all five unfilter paths)."""
    import numpy as np
    from wine_label_ocr_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    back = decode_png(encode_png(arr))
    assert back is not None and (back == arr).all()


_TAGS = ["div", "p", "a", "nav", "script", "style", "footer", "h1", "li",
         "span", "table", "aside", "header", "noscript"]
_soup_piece = st.one_of(
    st.sampled_from([f"<{t}>" for t in _TAGS]
                    + [f"</{t}>" for t in _TAGS]
                    + [f"<{t}/>" for t in _TAGS]
                    + ["<!-- c -->", "<!DOCTYPE html>", "<a href='#'>", "&amp;",
                       "&#65;", "<", ">", "</", "<a", "\r\n", "\t"]),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                   max_codepoint=0x2FF), max_size=20))


@given(st.lists(_soup_piece, max_size=60))
@settings(max_examples=150, deadline=None)
def test_lexer_total_and_consistent_on_tag_soup(pieces):
    """Structured adversarial HTML (unbalanced tags, comments, entities,
    half-open brackets): the lexer must never raise, and every block must
    satisfy its own invariants (non-empty text, link_chars <= n_chars,
    n_chars == len(text))."""
    doc = "".join(pieces)
    blocks = oracle.lex_blocks(doc)
    for b in blocks:
        assert b["text"] and b["n_chars"] == len(b["text"])
        assert 0 <= b["link_chars"] <= b["n_chars"]
        assert isinstance(b["boiler"], bool)
    # full extraction is total on the same soup (bytes path)
    out = oracle.extract(doc.encode("utf-8", "replace"), "https://x/y")
    assert out["text"] is not None
    for s in out["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(out["text"])


def test_lexer_linear_on_truncated_tag():
    """Regression (r9): an UNCLOSED tag open followed by a long plain run
    — exactly what a truncated crawl capture looks like — made the old
    attr alternation backtrack over every split of the run (exponential;
    `<a ` + 40 chars already ran for minutes, found by the tag-soup
    hypothesis test). With possessive run/quote quantifiers the failure
    is a single forward scan. Pin the timing at sizes where the old
    pattern would never return, across the shapes that drove each
    alternation branch: plain run, slash run, unclosed double quote,
    and a degenerate many-opens document (the documented quadratic
    tail, still sub-second)."""
    import time
    docs = ["<a " + "x" * 100_000,
            "<a " + "x/" * 50_000,
            '<a "' + "x " * 50_000,
            ("<a " + "y" * 50) * 2_000,
            "pre <div>kept</div> <a " + "x" * 100_000]
    t0 = time.time()
    for doc in docs:
        blocks = oracle.lex_blocks(doc)
        for b in blocks:
            assert b["text"] and b["n_chars"] == len(b["text"])
    assert time.time() - t0 < 5.0, "lexer non-linear on truncated tags"
    # the text before the truncated tag still lexes
    assert any(b["text"] == "kept" for b in oracle.lex_blocks(docs[4]))
