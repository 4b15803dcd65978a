"""Deterministic synthetic pages table (FIXTURES.md §1, seed=42).

Builds the engine's primary input table
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``
per BASELINE.json ``input_hint`` — Common-Crawl-style pages with known main
content wrapped in boilerplate. Local-only, no external data.

Every row is generated from a *pure function of its row index* (no shared
RNG sequence), so generation is order-independent and can run distributed:
``pages_spark`` generates the same rows whether built on 1 partition or 256.

The ``text`` column is the ground truth the oracle (and therefore the Spark
pipeline) must recover byte-identically. The fixture set deliberately
includes, per FIXTURES.md:

* a Zipf-skewed host pool (3 hot hosts ≈ 30% of rows — skew/salting is
  exercised, not just claimed: SURVEY.md §7.3.5);
* ~5% ``%PDF-`` payloads (layout-parse branch);
* ~2% degraded rows (truncated inside the footer — tolerant parsing,
  the analog of final_run_ocr.py:121-142);
* fr/de/es pages with accented characters, half of them latin-1-encoded
  with a meta charset declaration (charset-detection branch);
* HTML entities in the body (&amp;, &eacute;) that must decode exactly.
"""

from __future__ import annotations

import html as _htmlmod
import random
from datetime import datetime, timedelta
from typing import Any

SEED = 42

HOT_HOSTS = ["bigportal.example.com", "hub.example.net", "megasite.example.org"]
COLD_HOSTS = [f"site{i:03d}.example.com" for i in range(47)]

WORDS = {
    "en": ("the quick brown fox jumps over a lazy dog while autumn wind "
           "carries dry leaves across the old stone bridge near the river "
           "mill and farmers gather ripe grapes under pale morning light "
           "before the harvest festival begins in the valley town square "
           "market vendors arrange bottles of aged wine on wooden tables").split(),
    "fr": ("le château produit un vin élégant avec des arômes de fruits "
           "rouges et une finale soyeuse récolté à la main dans les vignes "
           "anciennes près de la rivière où les coteaux calcaires donnent "
           "une belle minéralité au cépage noble élevé en fût de chêne").split(),
    "de": ("der Winzer keltert einen kräftigen Wein mit feiner Säure und "
           "Noten von Äpfeln und Gewürzen die Trauben reifen spät am steilen "
           "Hang über dem Fluss wo kühle Nächte für Frische sorgen und das "
           "Fass aus Eiche rundet den Geschmack harmonisch ab").split(),
    "es": ("la bodega elabora un vino intenso con aromas de cereza madura y "
           "especias dulces las viñas viejas crecen en suelos calcáreos "
           "junto al río donde el clima fresco conserva la acidez natural y "
           "la crianza en barrica aporta taninos sedosos").split(),
}
LANGS = ["en"] * 7 + ["fr", "de", "es"]

TITLE_WORDS = ("Ridge Crest Valley Stone Creek Oak River Hill Summit Vineyard "
               "Cellars Estate Reserve Heritage Grand Royal Silver Golden "
               "Château Niño Über").split()

NAV_ANCHORS = ("Home About Contact Products News Blog Shop Login Register "
               "Careers Support FAQ Terms Privacy Sitemap Press Events "
               "Partners Gallery Reviews").split()

EPOCH = datetime(2025, 1, 1)


def _rng(i: int) -> random.Random:
    return random.Random((SEED * 0x9E3779B97F4A7C15 + i * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFF)


def _host(rng: random.Random) -> str:
    # 30% of rows on 3 hot hosts (FIXTURES.md §1 skew requirement)
    if rng.random() < 0.30:
        return rng.choice(HOT_HOSTS)
    return rng.choice(COLD_HOSTS)


def _paragraph(rng: random.Random, lang: str, n_words: int) -> str:
    words = WORDS[lang]
    toks = [rng.choice(words) for _ in range(n_words)]
    # occasional ampersand — exercises entity decode round-trip
    if rng.random() < 0.2:
        toks[rng.randrange(len(toks))] = "&"
    return " ".join(toks)


def _pdf_escape(s: str) -> bytes:
    b = s.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _pdf_escape_octal(s: str) -> bytes:
    """Literal-string escape using octal ``\\ddd`` for delimiters, controls
    and non-ASCII bytes (ISO 32000-1 §7.3.4.2) — exercises the octal path
    of the extractor's unescaper."""
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x5C, 0x28, 0x29) or b >= 0x80 or b < 0x20:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def _split_mid_space(p: str) -> tuple[str, str] | None:
    k = p.find(" ", len(p) // 2)
    if k == -1:
        k = p.rfind(" ")
    if k <= 0 or not p[:k] or not p[k + 1:]:
        return None
    return p[:k], p[k + 1:]


def _make_pdf(paras: list[str], title: str, flavor: int = 0) -> bytes:
    """A minimal deterministic PDF-like payload. ``flavor`` picks the
    content-stream shape so each parser path in ``oracle._pdf_paragraphs``
    gets fixture coverage; every flavor round-trips ``paras``/``title``:

    0 — uncompressed ``(s) Tj`` shows, literal ``/Title`` (legacy shape)
    1 — FlateDecode content stream, two shows per BT block
    2 — ``[(w) -250 (w)] TJ`` arrays (word-gap kern + no-space kerns)
    3 — hex strings with embedded whitespace, UTF-16BE hex ``/Title``
    4 — ``'`` / ``"`` show operators, octal escapes
    5 — ASCII85-wrapped FlateDecode stream (``[/ASCII85Decode /FlateDecode]``)
    6 — ASCIIHexDecode stream (uncompressed shows, hex transport)
    """
    import zlib
    if flavor == 3:
        tb = b"\xfe\xff" + title.encode("utf-16-be")
        title_obj = (b"1 0 obj << /Title <" + tb.hex().upper().encode("ascii")
                     + b"> >> endobj\n")
    else:
        title_obj = b"1 0 obj << /Title (" + _pdf_escape(title) + b") >> endobj\n"

    body = bytearray()
    for pi, p in enumerate(paras):
        if flavor == 2:
            items: list[bytes] = []
            for k, w in enumerate(p.split(" ")):
                if k:
                    items.append(b"-250")  # <= word-gap threshold: a space
                if k == 0 and len(w) > 1:
                    # intra-word kerns above the threshold join with no space
                    items.append(b"(" + _pdf_escape(w[:1]) + b") -50 10 ("
                                 + _pdf_escape(w[1:]) + b")")
                else:
                    items.append(b"(" + _pdf_escape(w) + b")")
            body += b"BT [ " + b" ".join(items) + b" ] TJ ET\n"
        elif flavor == 3:
            hx = p.encode("utf-8").hex().upper()
            spaced = " ".join(hx[i:i + 32] for i in range(0, len(hx), 32))
            body += b"BT <" + spaced.encode("ascii") + b"> Tj ET\n"
        elif flavor == 4:
            op = b"'" if pi % 2 else b'"'
            pre = b"" if pi % 2 else b"0.25 0 "
            body += b"BT " + pre + b"(" + _pdf_escape_octal(p) + b") " + op + b" ET\n"
        elif flavor == 1 and (halves := _split_mid_space(p)):
            body += (b"BT (" + _pdf_escape(halves[0]) + b") Tj 0 -14 Td ("
                     + _pdf_escape(halves[1]) + b") Tj ET\n")
        else:
            body += b"BT (" + _pdf_escape(p) + b") Tj ET\n"

    if flavor == 1:
        data = zlib.compress(bytes(body))
        stream_obj = (b"2 0 obj << /Filter /FlateDecode /Length "
                      + str(len(data)).encode("ascii") + b" >> stream\n"
                      + data + b"\nendstream endobj\n")
    elif flavor == 5:
        import base64
        data = base64.a85encode(zlib.compress(bytes(body)), wrapcol=64) + b"~>"
        stream_obj = (b"2 0 obj << /Filter [/ASCII85Decode /FlateDecode] "
                      b"/Length " + str(len(data)).encode("ascii")
                      + b" >> stream\n" + data + b"\nendstream endobj\n")
    elif flavor == 6:
        hx = bytes(body).hex().upper().encode("ascii")
        data = b"\n".join(hx[i:i + 64] for i in range(0, len(hx), 64)) + b">"
        stream_obj = (b"2 0 obj << /Filter /ASCIIHexDecode /Length "
                      + str(len(data)).encode("ascii") + b" >> stream\n"
                      + data + b"\nendstream endobj\n")
    else:
        stream_obj = (b"2 0 obj << /Length 0 >> stream\n" + bytes(body)
                      + b"endstream endobj\n")

    return (b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n" + title_obj + stream_obj
            + b"trailer << /Root 1 0 R >>\n%%EOF\n")


def make_page(i: int) -> dict[str, Any]:
    """Pure function: row index → one page row + ground truth.

    Returns ``{url, warc_ts, html, text, lang, title, year, kind}`` where
    ``title``/``year``/``kind`` are extra ground-truth fields for tests (the
    5-column pages table projects them away).
    """
    rng = _rng(i)
    lang = LANGS[rng.randrange(len(LANGS))]
    host = _host(rng)
    url = f"https://{host}/p/{i:09d}.html"
    warc_ts = EPOCH + timedelta(seconds=i * 37 % 31_536_000, microseconds=(i * 777) % 1_000_000)

    n_paras = rng.randint(2, 6)
    paras = [_paragraph(rng, lang, rng.randint(30, 80)) for _ in range(n_paras)]
    title = " ".join(rng.choice(TITLE_WORDS) for _ in range(rng.randint(2, 4)))
    year = rng.randint(1900, 2030) if rng.random() < 0.8 else None
    if year is not None and rng.random() < 0.4:
        # year also inside the main text (primary path of the E5 cascade)
        k = rng.randrange(n_paras)
        paras[k] = paras[k] + f" Vintage {year}."

    kind = "html"
    r = rng.random()
    if r < 0.05:
        kind = "pdf"
    elif r < 0.07 and lang == "en":
        kind = "degraded"

    if kind == "pdf" and year is not None and f"Vintage {year}." not in paras[-1]:
        # PDFs carry no footer, so the year must live in the body
        paras[-1] = paras[-1] + f" Vintage {year}."

    text = "\n\n".join(paras)

    if kind == "pdf":
        payload = _make_pdf(paras, title)
        return {"url": url, "warc_ts": warc_ts, "html": payload, "text": text,
                "lang": lang, "title": title, "year": year, "kind": kind,
                "canonical": None}

    latin1 = lang in ("fr", "de", "es") and rng.random() < 0.5
    charset = "iso-8859-1" if latin1 else "utf-8"

    nav_items = "".join(
        f'<li><a href="/{a.lower()}">{a}</a></li>'
        for a in rng.sample(NAV_ANCHORS, rng.randint(8, 14))
    )
    farm_items = "".join(
        f'<li><a href="https://{rng.choice(COLD_HOSTS)}/x{j}">'
        f'{" ".join(rng.choice(NAV_ANCHORS) for _ in range(rng.randint(1, 3)))}</a></li>'
        for j in range(rng.randint(5, 12))
    )
    body_paras = "".join(f"<p>{_htmlmod.escape(p)}</p>" for p in paras)
    footer_year = f"© {year} {host}. All rights reserved." if year else f"{host}. All rights reserved."
    canonical = (f'<link rel="canonical" href="{url}">'
                 if rng.random() < 0.6 else "")
    doc = (
        f'<!DOCTYPE html><html><head><meta charset="{charset}">'
        f"{canonical}<title>{_htmlmod.escape(title)}</title>"
        f"<style>body{{margin:0}}.x{{color:#333}}</style>"
        f'<script>var q={{"a":1}};</script></head>'
        f"<body><header><nav><ul>{nav_items}</ul></nav></header>"
        f'<div class="sidebar"><ul>{farm_items}</ul></div>'
        f"<article>{body_paras}</article>"
        f"<footer><p>{footer_year}</p><p>Follow us on social media for updates"
        f" and exclusive offers every week.</p></footer></body></html>"
    )
    payload = doc.encode("latin-1" if latin1 else "utf-8")
    if kind == "degraded":
        # truncate inside the (pure-ASCII, en-only) footer's SECOND paragraph:
        # main text and the footer year stay intact, the tail is torn mid-tag
        cut = doc.index("Follow us") + rng.randint(5, 30)
        payload = doc[:cut].encode("utf-8")
    return {"url": url, "warc_ts": warc_ts, "html": payload, "text": text,
            "lang": lang, "title": title, "year": year, "kind": kind,
            "canonical": url if canonical else None}


def render_doc_page(doc_id: int, text: str, lang: str, source: str) -> dict[str, Any]:
    """Wrap one testdata ``documents`` row as a boilerplated web page.

    Deterministic per doc_id; the extraction pipeline must recover ``text``
    byte-identically. Used by ``__spark_entry__.entry`` to run the flagship
    query over driver-provided tables.
    """
    rng = _rng(0x0D0C ^ (doc_id * 2654435761))
    host = _host(rng)
    url = f"https://{host}/doc/{doc_id:09d}.html"
    warc_ts = EPOCH + timedelta(seconds=(doc_id * 53) % 31_536_000)
    title = f"{source.upper()} DOC {doc_id}"
    year = 1900 + (doc_id % 131)
    nav_items = "".join(
        f'<li><a href="/{a.lower()}">{a}</a></li>'
        for a in rng.sample(NAV_ANCHORS, 10))
    doc = (
        f'<!DOCTYPE html><html><head><meta charset="utf-8">'
        f"<title>{_htmlmod.escape(title)}</title></head>"
        f"<body><header><nav><ul>{nav_items}</ul></nav></header>"
        f"<article><p>{_htmlmod.escape(text)}</p></article>"
        f"<footer><p>© {year} {host}. All rights reserved.</p></footer>"
        f"</body></html>"
    )
    return {"url": url, "warc_ts": warc_ts, "html": doc.encode("utf-8"),
            "text": text, "lang": lang, "title": title, "year": year}


def documents_as_pages(spark, sf_dir: str):
    """documents.parquet → pages DataFrame (url, warc_ts, html, text, lang)."""
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = [render_doc_page(int(d), t, l, s)
                    for d, t, l, s in zip(pdf["doc_id"], pdf["text"],
                                          pdf["lang"], pdf["source"])]
            out = pd.DataFrame(rows)
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", "text", "lang", "source").mapInPandas(
        gen, schema=PAGES_DDL)


def documents_as_pdf_pages(spark, sf_dir: str):
    """documents.parquet → PDF-payload pages (layout-parse branch).

    Each document's text becomes one PDF text object, with the
    content-stream shape cycling through every ``_make_pdf`` flavor
    (uncompressed Tj / FlateDecode / TJ arrays / hex strings /
    ``'``-``"`` shows / ASCII85+Flate / ASCIIHex+Flate) keyed on
    ``doc_id % 7``; the pipeline must route it via the ``%PDF-`` magic
    to the layout parser and recover ``text`` byte-identically whatever
    the encoding.
    """
    def gen(batches):
        import pandas as pd
        rows = []
        for pdf in batches:
            for d, t, l in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                rows.append({
                    "url": f"https://pdf.example.com/doc/{int(d):09d}.pdf",
                    "warc_ts": EPOCH + timedelta(seconds=(int(d) * 61) % 31_536_000),
                    "html": _make_pdf([t], f"PDF DOC {int(d)}",
                                      flavor=int(d) % 7),
                    "text": t,
                    "lang": l,
                })
            out = pd.DataFrame(rows)
            rows = []
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_DDL)


def documents_as_media(spark, sf_dir: str):
    """documents.parquet → real PNG/JPEG/animated-WebP payloads, built
    100% JVM-side.

    Each doc becomes a minimal-but-valid image whose dimensions are a
    pure function of doc_id (width = 16 + doc_id % 240, height =
    16 + doc_id*7 % 240), so a DuckDB oracle can recompute the expected
    decode output without parsing bytes. Payload bytes are assembled with
    hex-string column algebra + ``to_binary`` — no Python in the plan.

    Every 9th doc ships as a REAL animated WebP (VP8X ANIMATION flag +
    ANIM + 1+doc_id%4 ANMF chunks, each embedding a constant 1×1 VP8L
    frame — frames may be smaller than the canvas per the spec's
    frame-region model): the constant ANMF chunk repeats k times and
    only the RIFF size / canvas dims are column math, so the payload
    stays JVM-built while ``webp_frame_count``'s structural walk must
    report the true k for the oracle's n_frames to match.
    """
    from pyspark.sql import functions as F

    from .operators.multimodal import encode_webp_animated

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (F.lit(16) + F.col("doc_id") % 240).cast("int")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 240).cast("int")
    w8 = F.lpad(F.lower(F.hex(w)), 8, "0")
    h8 = F.lpad(F.lower(F.hex(h)), 8, "0")
    w4 = F.lpad(F.lower(F.hex(w)), 4, "0")
    h4 = F.lpad(F.lower(F.hex(h)), 4, "0")
    # PNG: signature + IHDR(len=13) + w,h + bitdepth 8, colortype 2 (RGB),
    # compression/filter/interlace 0 + (unchecked) CRC
    png_hex = F.concat(F.lit("89504e470d0a1a0a0000000d49484452"),
                       w8, h8, F.lit("080200000000000000"))
    # JPEG: SOI + SOF0(len=0x11, precision 8, h, w, 3 components) + EOI
    jpg_hex = F.concat(F.lit("ffd8ffc0001108"), h4, w4,
                       F.lit("03011100021101031101ffd9"))

    # animated WebP: the constant 1x1 100 ms ANMF chunk comes from the
    # real encoder (RIFF 12 + VP8X 18 + ANIM 14 = offset 44); the RIFF
    # size and 24-bit canvas dims are little-endian column hex
    ref = encode_webp_animated([[[(42, 43, 44)]]], [100])
    anmf = ref[44:]
    assert anmf[:4] == b"ANMF"

    def le_hex(col, nbytes):
        return F.concat(*[
            F.lpad(F.lower(F.hex(F.shiftright(col.cast("long"), 8 * i)
                                 % 256)), 2, "0")
            for i in range(nbytes)])

    k = (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int")
    riff_size = F.lit(36) + F.lit(len(anmf)) * k
    webp_hex = F.concat(
        F.lit("52494646"), le_hex(riff_size, 4), F.lit("57454250"),
        F.lit("565038580a000000" + "02000000"),        # VP8X, ANIM flag
        le_hex(w - 1, 3), le_hex(h - 1, 3),
        F.lit("414e494d06000000" + "000000000000"),    # ANIM, loop 0
        F.repeat(F.lit(anmf.hex()), k))
    is_anim = F.col("doc_id") % 9 == 0
    is_png = F.col("doc_id") % 2 == 0
    return d.select(
        F.concat(F.lit("media:"), F.col("doc_id").cast("string")).alias("url"),
        F.to_binary(F.when(is_anim, webp_hex).when(is_png, png_hex)
                    .otherwise(jpg_hex),
                    F.lit("hex")).alias("payload"),
        F.when(is_anim, F.lit("webp")).when(is_png, F.lit("png"))
        .otherwise(F.lit("jpeg")).alias("media_type"))


def documents_as_media_pixels(spark, sf_dir: str):
    """documents.parquet → FULL-raster PNG payloads (real IDAT, valid
    CRCs) via the stdlib encoder, built distributed in ``mapInPandas``.

    Each doc is a solid-color RGB image — color (doc_id%256, doc_id*3%256,
    doc_id*7%256), size (8+doc_id%24) × (8+doc_id*7%24) — with the row
    filter CYCLING 0..4, so decoding exercises every PNG unfilter path
    while the expected pixel statistics stay a closed-form function of
    doc_id that a DuckDB oracle can recompute without touching bytes.
    Every 5th doc ships as an INDEXED-color PNG (color type 3: PLTE
    [(0,0,0), rgb], index plane of ones) that decodes to the SAME solid
    raster — the oracle needs no per-row case, yet a decoder that skips
    or mishandles the palette path falls back to header features
    (channels=1, wrong means) and breaks the hash. Every 7th (non-5th)
    doc ships Adam7-INTERLACED — again the same solid raster, so a
    decoder that skips interlace (header fallback) breaks the hash while
    the oracle stays closed-form.
    """
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_png

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 24, 8 + (i * 7) % 24
                rgb = (i % 256, (i * 3) % 256, (i * 7) % 256)
                if i % 5 == 0:
                    pal = np.array([[0, 0, 0], list(rgb)], dtype=np.uint8)
                    idx = np.ones((h, w), dtype=np.uint8)
                    png = encode_png(idx, palette=pal)
                else:
                    arr = np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))
                    png = encode_png(arr, interlace=(i % 7 == 0))
                rows.append((f"mediapx:{i}", png, "png"))
            yield pd.DataFrame(rows, columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_pixels_jpeg(spark, sf_dir: str):
    """documents.parquet → quality-100 baseline JPEG payloads (real
    Annex-K Huffman streams), built distributed in ``mapInPandas``.

    Each doc is a solid GRAY image — value ``doc_id%256`` (gray because
    the JFIF color matrix round-trips r=g=b exactly: Cb=Cr=128), size
    (8+doc_id%24) × (8+doc_id*7%24) — cycling through the decoder's
    structural paths: doc_id%3==0 → RGB 4:4:4, ==1 → RGB 4:2:0 (chroma
    upsample path), ==2 → single-component grayscale; every 5th doc
    additionally carries DRI/RSTn restart markers. At quality 100 every
    quantizer is 1, so the uniform raster decodes EXACTLY and the
    expected pixel statistics stay a closed-form function of doc_id —
    while a decoder that fails any path falls back to header features
    and breaks the hash."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_jpeg

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 24, 8 + (i * 7) % 24
                v = i % 256
                ri = 2 if i % 5 == 0 else 0
                mode = i % 3
                if mode == 2:
                    arr = np.full((h, w), v, dtype=np.uint8)
                    jpg = encode_jpeg(arr, quality=100, restart_interval=ri)
                else:
                    arr = np.full((h, w, 3), v, dtype=np.uint8)
                    sub = (2, 2) if mode == 1 else (1, 1)
                    jpg = encode_jpeg(arr, quality=100, subsampling=sub,
                                      restart_interval=ri)
                rows.append((f"mediajpg:{i}", jpg, "jpeg"))
            yield pd.DataFrame(rows, columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_pixels_jpeg_prog(spark, sf_dir: str):
    """documents.parquet → quality-100 PROGRESSIVE JPEG payloads (SOF2
    multi-scan streams), built distributed in ``mapInPandas``.

    Same solid-gray closed-form regime as the baseline JPEG fixture
    (value doc_id%256, size (8+doc_id%24) × (8+doc_id*7%24), doc_id%3
    cycling RGB 4:4:4 / RGB 4:2:0 / grayscale), but the payload cycles
    SCAN-SCRIPT shapes by doc_id%2: the default libjpeg-style script
    (spectral selection + successive approximation with DC and AC
    refinement passes) vs a spectral-selection-only script (Ah=Al=0) —
    so a decoder that mishandles either progressive mode falls back to
    header features and breaks the hash while the oracle stays
    closed-form."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_jpeg_progressive

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 24, 8 + (i * 7) % 24
                v = i % 256
                mode = i % 3
                if mode == 2:
                    arr = np.full((h, w), v, dtype=np.uint8)
                    spectral = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
                    sub = (1, 1)
                else:
                    arr = np.full((h, w, 3), v, dtype=np.uint8)
                    sub = (2, 2) if mode == 1 else (1, 1)
                    spectral = [([0, 1, 2], 0, 0, 0, 0),
                                ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0),
                                ([2], 1, 63, 0, 0)]
                scans = None if i % 2 == 0 else spectral
                jpg = encode_jpeg_progressive(arr, quality=100,
                                              subsampling=sub, scans=scans)
                rows.append((f"mediajpgp:{i}", jpg, "jpeg"))
            yield pd.DataFrame(rows, columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_pixels_gif(spark, sf_dir: str):
    """documents.parquet → single-frame GIF payloads (real LZW streams),
    built distributed in ``mapInPandas``.

    Each doc is a solid-color image — color (doc_id%256, doc_id*3%256,
    doc_id*7%256) through a 2-entry palette, size (8+doc_id%24) ×
    (8+doc_id*7%24) — so the decoded raster is exact and the expected
    pixel statistics stay a closed-form function of doc_id. Every 3rd
    doc is 4-pass INTERLACED (same solid raster; a decoder that skips
    the row reorder... still decodes the same solid color, so the
    structural interlace path is additionally pinned by pytest on
    non-uniform patterns) and every 5th doc prepends a GIF89a graphic-
    control extension block the parser must skip."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_gif

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 24, 8 + (i * 7) % 24
                rgb = (i % 256, (i * 3) % 256, (i * 7) % 256)
                pal = np.array([[1, 2, 3], list(rgb)], dtype=np.uint8)
                idx = np.ones((h, w), dtype=np.uint8)
                gif = encode_gif(idx, pal, interlace=(i % 3 == 0))
                if i % 5 == 0:
                    # splice a graphic-control extension after the
                    # 13-byte header + 6-byte global color table
                    cut = 13 + 6
                    gif = (gif[:cut]
                           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
                           + gif[cut:])
                rows.append((f"mediagif:{i}", gif, "gif"))
            yield pd.DataFrame(rows, columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_pixels_webp(spark, sf_dir: str):
    """documents.parquet → WebP-lossless (VP8L) payloads, built
    distributed in ``mapInPandas``. Each doc is a solid-color image —
    color (doc_id%256, doc_id*3%256, doc_id*7%256), size
    (8+doc_id%24) × (8+doc_id*7%24) — so the decoded raster is exact
    and the expected pixel statistics stay a closed-form function of
    doc_id (the GIF/PNG gate pattern). The bitstream SHAPE cycles per
    doc_id%4 to pin every transform path through the hash gate: 0 =
    plain literal stream, 1 = predictor transform (mode = doc_id%14,
    incl. the 4px-tile multi-tile grid when doc_id%2==1), 2 =
    cross-color (doc_id-derived signed deltas), 3 = predictor AND
    cross-color chained. Transforms are lossless, so the oracle's
    closed-form stats are unchanged; any inverse-transform bug (border
    rules, tile lookup, delta algebra, inversion order) breaks the
    means. Richer entropy paths — normal codes, LZ77, cache, palette
    bundling — are pytest-pinned on hand-built streams."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_webp_lossless

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 24, 8 + (i * 7) % 24
                rgb = np.zeros((h, w, 3), np.uint8)
                rgb[:, :] = (i % 256, (i * 3) % 256, (i * 7) % 256)
                variant = i % 4
                pred = i % 14 if variant in (1, 3) else None
                cc = (((i * 11) % 256, (i * 13) % 256, (i * 17) % 256)
                      if variant in (2, 3) else None)
                tb = 2 if variant == 1 and i % 2 == 1 else 9
                rows.append((f"mediawebp:{i:09d}",
                             encode_webp_lossless(
                                 rgb, predictor_mode=pred,
                                 cross_color=cc, transform_bits=tb),
                             "webp"))
            yield pd.DataFrame(rows, columns=["url", "payload",
                                              "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_frames(spark, sf_dir: str):
    """documents.parquet → ANIMATED GIF payloads (2–4 frames each),
    built distributed in ``mapInPandas``.

    Per doc: 16×16 screen, 4-color global table (bg = slot 3), frame 0
    a full-screen solid color ``doc_id%3``, frames k ≥ 1 solid 8×8
    patches at (4,4) colored ``(doc_id+k)%3``. Every 5th doc uses
    disposal method 2 (restore-to-background) on all frames, the rest
    disposal 1 (leave) — so each composited frame's channel sums are a
    CLOSED-FORM function of (doc_id, k): frame 0 = 256·pal[c0]; k ≥ 1
    leaves 192·pal[c0] + 64·pal[ck] (disposal 1) or
    192·pal[bg] + 64·pal[ck] (disposal 2). A Netscape application
    extension is present on every file (the parser must length-skip
    it)."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_gif_animated

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90],
                        [200, 210, 220]], dtype=np.uint8)
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 2 + i % 3
                frames = [(np.full((16, 16), i % 3, np.uint8), 0, 0)]
                for k in range(1, n):
                    frames.append(
                        (np.full((8, 8), (i + k) % 3, np.uint8), 4, 4))
                disp = [2] * n if i % 5 == 0 else [1] * n
                gif = encode_gif_animated(frames, pal, bg_idx=3,
                                          screen=(16, 16), disposals=disp)
                rows.append((f"mediaframes:{i:09d}", gif, "gif"))
            yield pd.DataFrame(rows,
                               columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


def documents_as_media_frames_webp(spark, sf_dir: str):
    """documents.parquet → ANIMATED WebP payloads (2–4 ANMF frames),
    the ``documents_as_media_frames`` twin over the WebP container.

    Same geometry and palette as the GIF fixture — 16×16 canvas,
    frame 0 full-canvas solid PAL[doc_id%3], frames k ≥ 1 solid 8×8
    patches at (4,4) colored PAL[(doc_id+k)%3] — so the per-frame
    channel sums share the GIF gate's closed form. WebP-specific
    coverage cycles through the flag byte: every 5th doc uses
    dispose-to-background (0x03) against the NONZERO ANIM background
    (200,210,220,255) — the container's own background-color path,
    not a palette slot — every 3rd (non-5th) doc uses straight
    ALPHA-BLEND frames (0x00; opaque sources, so the closed form is
    unchanged but the blend arithmetic runs), and the rest no-blend
    replace (0x02). Frame offsets ride the stored-/2 encoding."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_webp_animated

    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    bg = (200, 210, 220, 255)

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 2 + i % 3
                fl = 0x03 if i % 5 == 0 else (0x00 if i % 3 == 0 else 0x02)
                f0 = np.zeros((16, 16, 3), np.uint8)
                f0[:, :] = pal[i % 3]
                frames, offs = [f0], [(0, 0)]
                for k in range(1, n):
                    p = np.zeros((8, 8, 3), np.uint8)
                    p[:, :] = pal[(i + k) % 3]
                    frames.append(p)
                    offs.append((4, 4))
                wp = encode_webp_animated(
                    frames, [100] * n, canvas=(16, 16), offsets=offs,
                    flags=[fl] * n, bgcolor=bg)
                rows.append((f"mediawebpfr:{i:09d}", wp, "webp"))
            yield pd.DataFrame(rows,
                               columns=["url", "payload", "media_type"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(
        gen, schema="url string, payload binary, media_type string")


# 8 deterministic 9-value luma patterns for the dHash gate: each image is
# 8 rows × 9 two-pixel-wide blocks of constant gray, so the 8×9 block
# means equal the pattern EXACTLY and the expected dHash is derivable
# without touching bytes (closed-form oracle; the engine still runs the
# full decode → luma → block-mean → gradient path).
DHASH_PATTERNS = tuple(tuple((17 * (i + 1) * (j + 3)) % 256 for j in range(9))
                       for i in range(8))


def documents_as_media_dhash(spark, sf_dir: str):
    """documents.parquet → grayscale block-pattern PNGs for the
    perceptual-hash gate (row filters cycle 0..4 as usual; every 3rd doc
    Adam7-interlaced — same raster, so the expected hash is unchanged
    but an interlace-skipping decoder fails)."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_png

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                pat = DHASH_PATTERNS[i % 8]
                arr = np.repeat(np.array(pat, dtype=np.uint8), 2)[None, :] \
                        .repeat(8, axis=0)
                png = encode_png(arr, interlace=(i % 3 == 0))
                rows.append((f"dhash:{i:09d}", png))
            yield pd.DataFrame(rows, columns=["url", "payload"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(gen, schema="url string, payload binary")


def documents_as_media_audio(spark, sf_dir: str):
    """documents.parquet → REAL 16-bit PCM WAV payloads: one pure tone
    per doc at an EXACT FFT-bin frequency (rate 8192, n_fft 1024 ⇒ bin k
    = k·8 Hz; k = 32 + doc_id % 64), 2048 samples. Integer periods per
    window mean zero spectral leakage, so the dominant bin is a
    closed-form function of doc_id the oracle states directly, while the
    engine runs the full RIFF-decode → FFT path on real bytes."""
    from collections.abc import Iterable, Iterator

    from .operators.multimodal import encode_wav

    def gen(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            t = np.arange(2048)
            for i in pdf["doc_id"]:
                i = int(i)
                k = 32 + i % 64
                s = np.round(9000.0 * np.sin(2 * np.pi * k * t / 1024.0))
                rows.append((f"audio:{i:09d}",
                             encode_wav(s.astype(np.int16), 8192)))
            yield pd.DataFrame(rows, columns=["url", "payload"])

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return d.mapInPandas(gen, schema="url string, payload binary")


def pages_pandas(n: int, offset: int = 0):
    """Small-scale generation → pandas DataFrame (tests)."""
    import pandas as pd
    rows = [make_page(i) for i in range(offset, offset + n)]
    return pd.DataFrame(rows)


PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def pages_spark(spark, n: int, partitions: int = 32):
    """Distributed generation: spark.range → mapInPandas (Arrow-batched).

    Same rows regardless of partition count — each row derives only from
    its index. This is how the bench builds its 100k+-row input without
    shipping data from the driver.
    """
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = [make_page(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=PAGES_DDL)
    )
