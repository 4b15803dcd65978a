"""Frozen single-document reference extractor (the byte-identity oracle).

Pure Python, zero Spark. This module *defines* correct output: the Spark
pipeline's per-url extracted ``text`` must be byte-identical to
``extract(html, url)["text"]``. It plays the role the reference's golden
JSONL files play (``/root/reference/wine_database.jsonl:1-5``,
``/root/reference/storing_images/cellar.jsonl:1-11``).

Structure mirrors the reference's detect-then-read pipeline:

* charset detection        — rotation-alignment-search analog
                             (``hybrid.py:148-170``: try variants, keep the
                             one that scores best / decodes cleanly);
* HTML block lexer         — connected-component labeling analog
                             (``hybrid.py:189-227``: split the document into
                             contiguous regions with per-region stats);
* block feature gate       — blob predicate gate analog
                             (``hybrid.py:196-218``: keep a region iff its
                             geometry passes fixed thresholds);
* block scorer             — heuristic region detect analog
                             (``hybrid.py:131``: score = 0.4*size +
                             0.3*link-cleanliness + 0.3*density);
* title / year extraction  — field extraction analog
                             (``final_run_ocr.py:299-378``), with the
                             main-text-first / whole-page-fallback cascade of
                             ``_full_image_vintage_search``
                             (``final_run_ocr.py:187-297``);
* maker normalization      — ``_normalize_maker`` (``final_run_ocr.py:353-359``);
* layout fingerprint       — ``generate_blob_fingerprint``
                             (``hybrid.py:229-242``), with pinned float
                             formatting for determinism;
* PDF branch               — payloads starting with ``%PDF`` route through a
                             layout parse emitting the same span schema.

DO NOT change the constants or the normalization order here without
regenerating every golden fixture: byte-identity tests in
``tests/test_pipeline.py`` depend on this exact behavior.
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
from typing import Any

# --------------------------------------------------------------------------
# Constants (the analog of the reference's gate thresholds, hybrid.py:196-218
# and the 0.4/0.3/0.3 score weights of hybrid.py:131).
# --------------------------------------------------------------------------

MIN_BLOCK_CHARS = 25          # analog of min blob area 30 (hybrid.py:203)
MAX_LINK_DENSITY = 0.40       # analog of solidity gate (hybrid.py:214)
SCORE_THRESHOLD = 0.55        # analog of decision threshold (BlobSimilarity.py:107)
W_SIZE, W_LINK, W_DENSITY = 0.4, 0.3, 0.3   # hybrid.py:131 weights
SIZE_NORM_CHARS = 200.0
YEAR_MIN, YEAR_MAX = 1900, 2030   # final_run_ocr.py:161 range check

# Containers whose content is never main text (readability convention; the
# analog of the reference ignoring non-"bottle" classes,
# Char_Count_TurnTable.py:104-106).
BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside"})
SKIP_CONTAINERS = frozenset({"script", "style", "head", "noscript", "template"})
BLOCK_TAGS = frozenset({
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "main", "blockquote", "pre", "table", "ul", "ol",
    "tr", "br", "hr", "title", "body", "html", "figcaption", "dd", "dt",
})

# one-probe dispatch table for the lexer hot loop; insertion order gives
# the original precedence skip > a > boiler > block (later writes win)
_ACT_BLOCK, _ACT_LINK, _ACT_SKIP, _ACT_BOILER = 1, 2, 3, 4
_TAG_ACTION: dict[str, int] = {}
_TAG_ACTION.update(dict.fromkeys(BLOCK_TAGS, _ACT_BLOCK))
_TAG_ACTION.update(dict.fromkeys(BOILER_CONTAINERS, _ACT_BOILER))
_TAG_ACTION["a"] = _ACT_LINK
_TAG_ACTION.update(dict.fromkeys(SKIP_CONTAINERS, _ACT_SKIP))

# Ordered year patterns — the analog of the 4 ordered regex patterns in
# _extract_year_from_text (final_run_ocr.py:153-185): labeled contexts first,
# bare 4-digit fallback last. Keep these expressible in BOTH Python `re` and
# Java regex (the Spark pipeline uses the same strings via regexp_extract).
YEAR_PATTERNS = (
    r"(?i)(?:vintage|copyright|©|\(c\))\s*:?\s*((?:19|20)\d{2})",
    r"(?<![0-9])((?:19|20)\d{2})(?![0-9])",
)

# Maker charset whitelist — final_run_ocr.py:355 ALLOWED = "A-Z0-9 &'-".
_MAKER_STRIP_RE = re.compile(r"[^A-Z0-9 &'-]")
_WS_RE = re.compile(r"\s+")
_ALNUM_RE = re.compile(r"[A-Za-z0-9]")

# Attribute section: plain-char RUNS are consumed atomically
# ([^>"'/]++, with a lone / allowed when not closing the tag) instead of
# one char per lazy iteration — same match set (the tag still ends at the
# first unquoted > or />; fuzz + 3000-doc corpus verified span+group
# equality), ~1.24x faster on attribute-heavy markup.
#
# The run/quote quantifiers MUST be possessive (++/*+): every character
# such a unit could give back is in its own excluded class, so the token
# required after a give-back (closing quote, '/', '>', or another
# branch's first char) can never match there — backtracking only
# re-enumerates run SPLITS, which on an unclosed tag (a truncated page —
# routine in a crawl) is exponential: `<a ` + 40 plain chars and no `>`
# ran for minutes before r9 made these possessive (hypothesis found it;
# regression test pins the timing). Residual worst case is the unavoidable
# scan-to-failure per unclosed tag open: linear per open, quadratic only
# on degenerate all-`<a ` documents.
_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<!DOCTYPE[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:[^>\"'/]++|/(?!>)|\"[^\"]*+\"|'[^']*+')*?)(/?)>",
    re.DOTALL,
)
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_-]+)")
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")

# PDF branch (r9: full content-stream text extraction). A text object is
# `BT … ET`; inside it the show operators are `(s) Tj`, `(s) '`,
# `aw ac (s) "`, and the array form `[(a) -250 (b)] TJ` (ISO 32000-1
# §9.4.3); strings may be literal (balanced parens + escapes, §7.3.4.2)
# or hex (`<…>`, §7.3.4.3). Content streams usually ship
# FlateDecode-compressed inside `stream…endstream`; `_pdf_paragraphs`
# inflates those with stdlib zlib (output capped — a crawl sees zip
# bombs) and scans raw regions too, so the uncompressed fixture shape
# keeps working unchanged. All patterns here use possessive quantifiers
# (see _TAG_RE) and the paren scanner is a manual linear pass — no
# backtracking blow-ups on truncated/garbage payloads.
_PDF_TITLE_RE = re.compile(rb"/Title\s*+(?:\(((?:[^()\\]|\\.)*+)\)|<([0-9A-Fa-f\s]*+)>)")
_PDF_STREAM_RE = re.compile(rb"stream\r?\n?(.*?)(?:\r\n?|\n)?endstream",
                            re.DOTALL)
# content-stream tokens OTHER than literal strings (those need a manual
# scanner: balanced parens aren't regular); branches are first-byte
# disjoint, quantifiers possessive — one linear pass
_PDF_TOK_RE = re.compile(
    rb"[\x00\t\n\x0c\r ]++"                              # whitespace
    rb"|(?P<dict><<|>>)"                                 # before hex: << is a dict
    rb"|(?P<hex><[0-9A-Fa-f\x00\t\n\x0c\r ]*+>?)"        # hex string
    rb"|(?P<arr>[\[\]])"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]/%]*+)"
    rb"|(?P<num>[-+]?+(?:[0-9]++(?:\.[0-9]*+)?+|\.[0-9]++))"
    rb"|%[^\r\n]*+"                                      # comment
    rb"|(?P<op>[^\x00\t\n\x0c\r ()<>\[\]/%]++)"
    rb"|(?P<other>[<>])")
# inserting a space for a TJ kern adjustment at or below this many
# thousandths of text space is the standard extractor heuristic for a
# word gap (pdftotext-family); above it the adjustment is letter kerning
_PDF_TJ_SPACE_KERN = -180.0
_PDF_MAX_INFLATE = 8_000_000  # per-stream inflate cap (zip-bomb guard)


def normalize_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip.

    The single canonical whitespace policy shared by oracle and pipeline
    (risk §7.3.1 of SURVEY.md). Analog of the reference's
    ``re.sub(r"\\s+", " ", s).strip()`` in final_run_ocr.py:358.

    Fast path: an ascii string with no tabs/newlines/runs is already
    canonical up to strip — the checks are C-level scans, far cheaper
    than the regex rebuilding the string around every single space.
    (Non-ascii goes the slow path: ``\\s`` also matches unicode spaces.)
    """
    if (s.isascii() and "  " not in s and "\t" not in s and "\n" not in s
            and "\r" not in s and "\x0b" not in s and "\x0c" not in s):
        return s.strip()
    return _WS_RE.sub(" ", s).strip()


def normalize_maker(s: str | None) -> str | None:
    """E7 — maker normalization, exact reference semantics.

    ``_normalize_maker`` (final_run_ocr.py:353-359): uppercase, whitelist
    charset ``A-Z0-9 &'-``, collapse whitespace. Returns None for empty.
    """
    if s is None:
        return None
    s = _MAKER_STRIP_RE.sub("", s.upper())
    s = normalize_ws(s)
    return s or None


_YEAR_RES = tuple(re.compile(p) for p in YEAR_PATTERNS)


def extract_year(text: str) -> int | None:
    """E4 — ordered-pattern year extraction with range check.

    Mirrors ``_extract_year_from_text`` (final_run_ocr.py:153-185): try each
    pattern in priority order; the first in-range hit wins.

    The priority pattern's ``(?i)`` alternation is the expensive scan;
    it can only match when one of its literal markers is present, so a
    C-level substring probe gates it (same hit set — profiled ~12% of
    the extract kernel on marker-free documents).
    """
    # both patterns require a literal "19"/"20" decade prefix — absent
    # those substrings no candidate exists, and the two C-level probes
    # beat the regex scan ~30× (65% of bench main texts have neither)
    if "19" not in text and "20" not in text:
        return None
    tl = text.lower()
    if ("vintage" in tl or "copyright" in tl or "©" in tl or "(c)" in tl):
        for m in _YEAR_RES[0].finditer(text):
            y = int(m.group(1))
            if YEAR_MIN <= y <= YEAR_MAX:
                return y
    for m in _YEAR_RES[1].finditer(text):
        y = int(m.group(1))
        if YEAR_MIN <= y <= YEAR_MAX:
            return y
    return None


_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "ascii": "ascii", "us-ascii": "ascii",
}


def detect_charset(payload: bytes, http_charset: str | None = None) -> str:
    """D7 analog — pick the best decode variant of the binary payload.

    Priority order per RFC 9110 §8.3 / HTML spec §8.2.2.2: an HTTP
    ``Content-Type`` charset (``http_charset``, surfaced by the WARC
    reader's envelope strip) wins over an in-document ``charset=``
    declaration in the first 2048 bytes; absent both, tries strict utf-8
    and falls back to latin-1 (which never fails). Mirrors the
    try-variants-keep-best-score structure of ``align_vertically``
    (hybrid.py:148-170).
    """
    if http_charset:
        got = _CHARSET_ALIASES.get(http_charset.strip().lower())
        if got:
            return got
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        if name in _CHARSET_ALIASES:
            return _CHARSET_ALIASES[name]
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


_PDF_ESC = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
            0x66: b"\x0c"}


def _pdf_str_bytes(raw: bytes) -> bytes:
    """Resolve literal-string escapes (ISO 32000-1 §7.3.4.2) to the raw
    string bytes: \\n \\r \\t \\b \\f, octal \\ddd (1–3 digits), a
    backslash-EOL line continuation (vanishes), and any other escaped
    char standing for itself (covers \\( \\) \\\\)."""
    if 0x5C not in raw:
        return raw
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        nxt = raw[i + 1]
        mapped = _PDF_ESC.get(nxt)
        if mapped is not None:
            out += mapped
            i += 2
        elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
            j = i + 1
            while j < min(i + 4, n) and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (0x0A, 0x0D):  # line continuation
            i += 2
            if nxt == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(nxt)
            i += 2
    return bytes(out)


def _pdf_decode_text(raw: bytes) -> str:
    """PDF text-string decode: UTF-16BE when the BOM says so (§7.9.2.2),
    else UTF-8 with replacement (the pragmatic web superset of
    PDFDocEncoding's ASCII range)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("utf-8", "replace")


def _pdf_unescape(raw: bytes) -> str:
    return _pdf_decode_text(_pdf_str_bytes(raw))


def _pdf_unhex(h: bytes) -> str:
    """Hex string (§7.3.4.3): whitespace ignored, odd length padded with
    a trailing 0."""
    compact = bytes(c for c in h if c not in b"<>\x00\t\n\x0c\r ")
    if len(compact) % 2:
        compact += b"0"
    try:
        return _pdf_decode_text(bytes.fromhex(compact.decode("ascii")))
    except ValueError:
        return ""


def _pdf_scan_literal(data: bytes, start: int) -> tuple[bytes, int]:
    """Scan a literal string from the byte after its opening '(' —
    balanced unescaped parens nest (§7.3.4.2). Returns (raw escaped
    bytes, index after the closing paren); a truncated string ends at
    EOF. One forward pass, no backtracking."""
    depth, i, n = 1, start, len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return data[start:i], i + 1
        i += 1
    return data[start:n], n


def _pdf_piece_paragraphs(piece: bytes) -> list[str]:
    """Paragraphs (one per BT..ET text object) of one decoded region, by
    a SINGLE token-level pass: `BT`/`ET` are operator tokens like any
    other, so string contents can never open or truncate a text object
    (r10 ADVICE fix — the former regex located BT..ET over raw bytes and
    a literal `ET` inside a shown string silently dropped the rest of
    the block; reference extractors tokenize before operator
    detection). Inside a block the show operators are `Tj`, `'`, `\"`
    (string operand) and `[..] TJ` (array concatenated, a kern
    adjustment ≤ _PDF_TJ_SPACE_KERN marks a word gap); positioning
    operators contribute nothing. Strings BETWEEN blocks are consumed as
    tokens (never shown, never spoofing a BT). A truncated block with no
    closing ET yields nothing, as before."""
    paras: list[str] = []
    in_bt = False
    parts: list[str] = []
    last_str: str | None = None
    arr: list[str] | None = None
    closed_arr: list[str] | None = None
    pos, n = 0, len(piece)
    while pos < n:
        if piece[pos] == 0x28:  # literal string — manual scan
            raw, pos = _pdf_scan_literal(piece, pos + 1)
            if in_bt:
                s = _pdf_unescape(raw)
                if arr is not None:
                    arr.append(s)
                else:
                    last_str = s
            continue
        m = _PDF_TOK_RE.match(piece, pos)
        if m is None:  # unscannable byte (inline image data etc.)
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        if not in_bt:
            if kind == "op" and m.group("op") == b"BT":
                in_bt = True
                parts = []
                last_str = None
                arr = None
                closed_arr = None
            continue
        if kind == "hex":
            s = _pdf_unhex(m.group("hex"))
            if arr is not None:
                arr.append(s)
            else:
                last_str = s
        elif kind == "arr":
            if m.group("arr") == b"[":
                arr, closed_arr = [], None
            else:
                closed_arr, arr = arr, None
        elif kind == "num":
            if arr is not None:
                try:
                    if float(m.group("num")) <= _PDF_TJ_SPACE_KERN:
                        arr.append(" ")
                except ValueError:
                    pass
        elif kind == "op":
            op = m.group("op")
            if op == b"ET":
                paras.append(" ".join(p for p in parts if p))
                in_bt = False
            elif op in (b"Tj", b"'", b'"'):
                if last_str is not None:
                    parts.append(last_str)
                    last_str = None
            elif op == b"TJ":
                if closed_arr is not None:
                    parts.append("".join(closed_arr))
                    closed_arr = None
    return paras


def _inflate(data: bytes) -> bytes | None:
    import zlib
    try:
        out = zlib.decompressobj().decompress(data, _PDF_MAX_INFLATE)
    except zlib.error:
        return None
    return out or None


_A85_OK = frozenset(range(0x21, 0x76)) | set(b"z\x00\t\n\x0c\r ")
_HEX_OK = frozenset(b"0123456789abcdefABCDEF\x00\t\n\x0c\r ")


def _pdf_decode_stream(data: bytes) -> bytes | None:
    """Decode one stream body through the offline-decodable filter
    chains (ISO 32000-1 §7.4): FlateDecode; ASCIIHexDecode or
    ASCII85Decode (§7.4.2/7.4.3), each alone or wrapping Flate. The
    `/Filter` entry lives in the object dict OUTSIDE the captured body,
    so the chain is probed — safely: the ASCII codecs only fire when
    the body is entirely inside their charsets (with the right
    terminator), which compressed/binary bodies essentially never are,
    and a wrong guess yields garbage with no `BT` (harmless)."""
    out = _inflate(data)
    if out is not None:
        return out
    s = data.strip(b"\x00\t\n\x0c\r ")
    if s[-2:] == b"~>" and all(c in _A85_OK for c in s[:-2]):
        import base64
        try:
            dec = base64.a85decode(s[:-2].translate(None, b"\x00\t\n\x0c\r "))
        except ValueError:
            return None
        return _inflate(dec) or dec or None
    if s[-1:] == b">" and all(c in _HEX_OK for c in s[:-1]):
        compact = s[:-1].translate(None, b"\x00\t\n\x0c\r ")
        if len(compact) % 2:
            compact += b"0"  # odd length pads with 0 (§7.4.2)
        try:
            dec = bytes.fromhex(compact.decode("ascii"))
        except ValueError:
            return None
        return _inflate(dec) or dec or None
    return None


def _pdf_paragraphs(payload: bytes) -> list[str]:
    """All text-object paragraphs of a PDF payload in document order.

    Walks `stream…endstream` segments: bodies decode through
    ``_pdf_decode_stream`` (Flate / ASCIIHex / ASCII85 chains — output
    capped at _PDF_MAX_INFLATE per stream; corrupt data skipped), raw
    bodies that carry a BT are scanned as-is (uncompressed content
    streams), and the regions BETWEEN streams are scanned too —
    fixtures and hand-made PDFs put text objects at top level. Each
    BT..ET is one paragraph."""
    pieces: list[bytes] = []
    pos = 0
    for m in _PDF_STREAM_RE.finditer(payload):
        pieces.append(payload[pos:m.start()])
        data = m.group(1)
        dec = _pdf_decode_stream(data)
        if dec is not None:
            pieces.append(dec)
        # raw-body fallback (r10 ADVICE fix): scan the raw body when the
        # decode produced nothing OR when a codec probe "succeeded" on a
        # body that was really raw text (garbage decode with no BT would
        # otherwise shadow the real text object in the raw bytes)
        if (dec is None or b"BT" not in dec) and b"BT" in data:
            pieces.append(data)
        pos = m.end()
    pieces.append(payload[pos:])
    return [p for piece in pieces for p in _pdf_piece_paragraphs(piece)]


def lex_blocks(decoded: str) -> list[dict[str, Any]]:
    """D4 analog — split a decoded HTML document into contiguous text blocks.

    Returns raw blocks with per-block stats, the analog of
    ``connectedComponentsWithStats`` per-blob stats (hybrid.py:189-227):
    ``{text, n_chars, link_chars, boiler, tag}``. Order is document order.
    """
    blocks: list[dict[str, Any]] = []
    # current block accumulator: list of (raw_text, is_link)
    segs: list[tuple[str, bool]] = []
    cur_tag = "body"
    boiler_depth = 0
    skip_depth = 0
    link_depth = 0
    seg_boiler = False  # whether any seg in current block was under boiler
    seg_link = False    # whether any seg in current block is link text

    # call sites guard on `segs` so the ~3x-more-common empty flush is a
    # plain cur_tag assignment, not a function call (profiled: flush was
    # 25% of kernel time at ~78 calls/doc, most with nothing to flush)
    unescape = _htmlmod.unescape

    def flush(next_tag: str) -> None:
        nonlocal seg_boiler, seg_link, cur_tag
        if len(segs) == 1:
            # single-seg block — the dominant case (nav/menu items are one
            # link seg). Skip the join, and when the lone seg is link text
            # its link_chars equals len(text) by construction (same
            # unescape+normalize of the same raw seg) — no second pass.
            raw = segs[0][0]
            text = normalize_ws(unescape(raw) if "&" in raw else raw)
            if text:
                blocks.append({
                    "text": text,
                    "n_chars": len(text),
                    "link_chars": len(text) if seg_link else 0,
                    "boiler": seg_boiler,
                    "tag": cur_tag,
                })
        else:
            raw = "".join([t for t, _ in segs])
            text = normalize_ws(unescape(raw) if "&" in raw else raw)
            if text:
                link_chars = 0
                if seg_link:
                    for t, is_link in segs:
                        if is_link:
                            link_chars += len(normalize_ws(
                                unescape(t) if "&" in t else t))
                    link_chars = min(link_chars, len(text))
                blocks.append({
                    "text": text,
                    "n_chars": len(text),
                    "link_chars": link_chars,
                    "boiler": seg_boiler,
                    "tag": cur_tag,
                })
        segs.clear()
        seg_boiler = False
        seg_link = False
        cur_tag = next_tag

    # local bindings — the loop runs once per tag over every document;
    # a single action-dict lookup replaces the 3 set probes + 'a' compare
    # (boring tags — the majority — now cost ONE dict miss)
    act_get = _TAG_ACTION.get
    segs_append = segs.append  # one list object for the whole document
    # ONE C-level split pass instead of finditer: parts is
    # [text, g1, g2, g3, g4, text, g1, ...] — the inter-tag text arrives
    # as list elements (no match objects, no span()/groups() calls, no
    # slicing), same match set and groups by construction (re.split
    # splits on every _TAG_RE match and interleaves its 4 groups)
    parts = _TAG_RE.split(decoded)
    last = len(parts) - 1
    idx = 0
    while idx < last:
        pre = parts[idx]
        g1 = parts[idx + 1]
        g2 = parts[idx + 2]
        g4 = parts[idx + 4]
        idx += 5
        if pre and skip_depth == 0:
            # not-isspace() ≡ strip() truthiness for non-empty strings,
            # without allocating the stripped copy
            if not pre.isspace():
                segs_append((pre, link_depth > 0))
                if boiler_depth > 0:
                    seg_boiler = True
                if link_depth > 0:
                    seg_link = True
            elif segs:
                segs_append((pre, link_depth > 0))
                if link_depth > 0:
                    seg_link = True
        if g2 is None:
            continue  # comment / doctype / CDATA
        # dispatch keys are lowercase: a direct hit means g2 IS already
        # canonical — skips the ~1.5M/20k-doc str.lower() allocations
        # the all-lowercase markup of real pages was paying
        action = act_get(g2)
        if action is not None:
            tag = g2
        else:
            tag = g2.lower()
            action = act_get(tag)
            if action is None:
                continue  # transparent tag (span/b/em/...)
        closing, selfclosed = g1 == "/", g4 == "/"
        if action == _ACT_BLOCK:
            if segs:
                flush(tag if not closing else cur_tag)
            elif not closing:
                cur_tag = tag
        elif action == _ACT_LINK:
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not selfclosed:
                link_depth += 1
        elif action == _ACT_SKIP:
            if selfclosed:
                pass
            elif closing:
                skip_depth = max(0, skip_depth - 1)
            else:
                skip_depth += 1
            if segs:
                flush(cur_tag)
        else:  # _ACT_BOILER
            if closing:
                boiler_depth = max(0, boiler_depth - 1)
            elif not selfclosed:
                boiler_depth += 1
            if segs:
                flush(tag if not closing else cur_tag)
            elif not closing:
                cur_tag = tag
    # trailing text after the last tag (degraded/truncated documents)
    tail = parts[last]
    if tail and not tail.isspace() and skip_depth == 0:
        segs_append((tail, link_depth > 0))
        if boiler_depth > 0:
            seg_boiler = True
        if link_depth > 0:
            seg_link = True
    if segs:
        flush(cur_tag)
    return blocks


def score_block(n_chars: int, link_density: float, text_density: float) -> float:
    """D2 analog — heuristic block score, hybrid.py:131 weight structure."""
    return (
        W_SIZE * min(n_chars / SIZE_NORM_CHARS, 1.0)
        + W_LINK * (1.0 - link_density)
        + W_DENSITY * text_density
    )


# deletion table for counting [A-Za-z0-9] without allocating a match list;
# len(text) - len(text.translate(...)) == len(_ALNUM_RE.findall(text))
_ALNUM_DELETE = {ord(c): None for c in
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"}


def _features(b: dict[str, Any]) -> tuple[float, float]:
    """(link_density, text_density) for a raw block (memoized per block)."""
    cached = b.get("_feat")
    if cached is not None:
        return cached
    n = max(b["n_chars"], 1)
    link_density = min(b["link_chars"] / n, 1.0)
    text = b["text"]
    n_alnum = len(text) - len(text.translate(_ALNUM_DELETE))
    text_density = n_alnum / n
    b["_feat"] = (link_density, text_density)
    return b["_feat"]


def keep_block(b: dict[str, Any]) -> bool:
    """P5 analog — the fixed predicate gate deciding main-content membership."""
    if b["boiler"]:
        return False
    if b["n_chars"] < MIN_BLOCK_CHARS:
        return False
    link_density, text_density = _features(b)
    if link_density > MAX_LINK_DENSITY:
        return False
    return score_block(b["n_chars"], link_density, text_density) >= SCORE_THRESHOLD


def fingerprint_spans(spans: list[dict[str, Any]]) -> str:
    """E13 — layout fingerprint with pinned float formatting.

    ``generate_blob_fingerprint`` (hybrid.py:229-242): sort by position,
    normalize, round, hash. We pin explicit %-format strings (risk §7.3.1)
    instead of Python ``str()`` of rounded floats.
    """
    if not spans:
        return "empty"
    parts = []
    for s in spans:
        parts.append((
            s["start"], s["end"],
            "%.4f,%.4f,%.3f,%.3f,%.3f,%.3f"
            % (s["cx"], s["cy"], s["area"], s["aspect_ratio"],
               s["solidity"], s["extent"])))
    # sort includes the formatted features so ties on (start, end) are
    # still order-canonical (hypothesis-found; pipeline spans have unique
    # starts, so their fingerprints are unchanged)
    parts.sort()
    return hashlib.md5(";".join(p[2] for p in parts).encode("utf-8")).hexdigest()[:16]


def rec_id(key: str) -> str:
    """E12 — content-hash id, ``hash_id`` (scan_and_store.py:49-52)."""
    return hashlib.sha1(key.encode("utf-8")).hexdigest()[:12]


def _spans_from_kept(kept: list[dict[str, Any]], n_blocks_total: int,
                     texts: list[str]) -> list[dict[str, Any]]:
    """Build span structs over the joined main text (FIXTURES.md §3 schema)."""
    total_len = len("\n\n".join(texts))
    spans = []
    offset = 0
    denom_idx = max(n_blocks_total - 1, 1)
    for i, (b, t) in enumerate(zip(kept, texts)):
        start = offset
        end = start + len(t)
        offset = end + 2  # "\n\n" separator
        link_density, text_density = _features(b)
        # t is canonical (single spaces): sum(len(w)) == len(t) - n_spaces
        # and n_words == n_spaces + 1 — identical value, no allocation
        n_spaces = t.count(" ")
        aspect = (len(t) - n_spaces) / (n_spaces + 1)
        spans.append({
            "start": start,
            "end": end,
            "tag": b["tag"],
            "cx": b["block_index"] / denom_idx,
            "cy": start / max(total_len, 1),
            "area": float(len(t)),
            "aspect_ratio": aspect,
            "solidity": text_density,
            "extent": 1.0 - link_density,
            "score": score_block(b["n_chars"], link_density, text_density),
        })
    return spans


def extract(payload: bytes, url: str,
            http_charset: str | None = None) -> dict[str, Any]:
    """The oracle: one document in, the canonical record out.

    Returns ``{text, title, maker_name, year, spans, fingerprint, method,
    charset, n_blocks, kept_blocks, raw_text}``. ``text`` is the
    byte-identity target; ``raw_text`` is the full visible text (used by the
    year fallback cascade, E5 analog). ``http_charset`` is the transport's
    charset claim (WARC HTTP envelope), which outranks in-document
    declarations — see ``detect_charset``.
    """
    if payload[:5] == b"%PDF-":
        paras = [normalize_ws(p) for p in _pdf_paragraphs(payload)]
        paras = [p for p in paras if p]
        text = "\n\n".join(paras)
        tm = _PDF_TITLE_RE.search(payload)
        title = None
        if tm:
            raw_title = (_pdf_unescape(tm.group(1)) if tm.group(1) is not None
                         else _pdf_unhex(tm.group(2)))
            title = normalize_ws(raw_title)
        kept = [{
            "text": p, "n_chars": len(p), "link_chars": 0,
            "boiler": False, "tag": "pdf", "block_index": i,
        } for i, p in enumerate(paras)]
        spans = _spans_from_kept(kept, max(len(paras), 1), paras)
        raw_text = text
        head_raw = ""
        method, charset, n_blocks = "pdf", "binary", len(paras)
    else:
        charset = detect_charset(payload, http_charset)
        decoded = payload.decode(charset, "replace")
        blocks = lex_blocks(decoded)
        for i, b in enumerate(blocks):
            b["block_index"] = i
        kept = [b for b in blocks if keep_block(b)]
        texts = [b["text"] for b in kept]
        text = "\n\n".join(texts)
        tm = _TITLE_RE.search(decoded)
        title = normalize_ws(_htmlmod.unescape(tm.group(1))) if tm else None
        spans = _spans_from_kept(kept, max(len(blocks), 1), texts)
        raw_text = "\n".join(b["text"] for b in blocks)
        head_raw = decoded[:2048]
        method, n_blocks = "html", len(blocks)

    # E5 cascade: main text first, whole visible page as fallback.
    year = extract_year(text)
    if year is None:
        year = extract_year(raw_text)
    maker = normalize_maker(title)
    custom_id = f"{maker}|{year}" if (maker is not None and year is not None) else None
    return {
        "url": url,
        "text": text,
        "title": title,
        "maker_name": maker,
        "year": year,
        "custom_id": custom_id,
        "rec_id": rec_id(custom_id) if custom_id else None,
        "spans": spans,
        "fingerprint": fingerprint_spans(spans),
        "method": method,
        "charset": charset,
        "n_blocks": n_blocks,
        "kept_blocks": len(spans),
        "raw_text": raw_text,
        "head_raw": head_raw,
    }
