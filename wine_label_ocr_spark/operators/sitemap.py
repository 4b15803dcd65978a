"""Sitemap parsing: XML urlset / sitemapindex (and the plain-text
flavor) → frontier seed URLs.

The discovery-side companion of ``operators/robots.py``: robots.txt
declares ``Sitemap:`` URLs (``robots_directives`` surfaces them), the
crawler fetches those documents, and this module turns the fetched
bytes into candidate URLs for the next cycle — the second half of the
robots→frontier composition. Reference analog: the tracker's seeded
work-list construction feeding ``WineTracker.run()``
(/root/reference/WineTracker.py:21-40), re-targeted at the
sitemaps.org protocol.

Formats handled (tolerant, the ST8 policy — malformed input yields
zero rows, never an exception):

* ``<urlset>`` with ``<url><loc>``/``<lastmod>`` children (the
  namespaced and namespace-free spellings both);
* ``<sitemapindex>`` with ``<sitemap><loc>`` children — emitted with
  ``kind='sitemap'`` so the crawl loop can fetch them NEXT cycle;
  index recursion is the crawler's job, not the parser's;
* the plain-text format (one URL per line);
* gzip-compressed payloads of any of the above (``.xml.gz``), with a
  decompression cap at the spec's 50 MB uncompressed limit so a
  hostile gzip bomb cannot blow up the Arrow worker (the
  ``decode_webp`` dimension-cap policy).

Scale shape: sitemaps are one-file-per-declaration (≤ 50k URLs each by
spec) — like robots files they are the SMALL side of everything, so a
per-file Python parse inside one Arrow-batched ``mapInPandas`` is the
right cost model; the emitted URL rows re-enter pure column algebra
(``canonical_url`` → distinct → anti-join) immediately.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame

# sitemaps.org: a sitemap file must be no larger than 50 MB uncompressed
_MAX_UNCOMPRESSED = 50 * 1024 * 1024
_GZIP_MAGIC = b"\x1f\x8b"


def _to_text(payload) -> str | None:
    """bytes|str → str, transparently gunzipping (bounded) and decoding
    UTF-8 tolerantly; None when the payload is empty/undecodable."""
    if payload is None:
        return None
    if isinstance(payload, str):
        return payload
    b = bytes(payload)
    if b[:2] == _GZIP_MAGIC:
        import zlib
        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            b = d.decompress(b, _MAX_UNCOMPRESSED)
            if d.unconsumed_tail:  # over the cap: hostile, reject
                return None
        except zlib.error:
            return None
    try:
        return b.decode("utf-8", errors="replace")
    except Exception:
        return None


def parse_sitemap_urls(payload) -> list[tuple[str, str | None, str]]:
    """Sitemap bytes/text → ``[(loc, lastmod, kind)]`` where ``kind``
    is ``'url'`` (a page, from ``<urlset>`` or the text format) or
    ``'sitemap'`` (a child sitemap, from ``<sitemapindex>``).

    Pure function (tested directly; the Spark op maps it). Tolerant
    everywhere: XML that does not parse falls back to the plain-text
    reading; entries without a ``<loc>`` are skipped; entities in
    ``<loc>`` are unescaped by the XML parser (the spec REQUIRES
    ``&`` → ``&amp;`` escaping in locs)."""
    text = _to_text(payload)
    if not text:
        return []
    stripped = text.lstrip("﻿ \t\r\n")
    if stripped.startswith("<"):
        import xml.etree.ElementTree as ET
        try:
            root = ET.fromstring(stripped)
        except ET.ParseError:
            return _parse_text_sitemap(text)
        tag = root.tag.rsplit("}", 1)[-1].lower()
        if tag not in ("urlset", "sitemapindex"):
            return []
        kind = "sitemap" if tag == "sitemapindex" else "url"
        out: list[tuple[str, str | None, str]] = []
        for entry in root:
            etag = entry.tag.rsplit("}", 1)[-1].lower()
            if etag not in ("url", "sitemap"):
                continue
            loc = lastmod = None
            for child in entry:
                ctag = child.tag.rsplit("}", 1)[-1].lower()
                if ctag == "loc":
                    loc = (child.text or "").strip()
                elif ctag == "lastmod":
                    lastmod = (child.text or "").strip() or None
            if loc:
                out.append((loc, lastmod, kind))
        return out
    return _parse_text_sitemap(text)


def _parse_text_sitemap(text: str) -> list[tuple[str, str | None, str]]:
    """The sitemaps.org plain-text format: one URL per line, nothing
    else. Lines that are not http(s) URLs are skipped (tolerant)."""
    out = []
    for line in text.splitlines():
        u = line.strip()
        if u.lower().startswith(("http://", "https://")):
            out.append((u, None, "url"))
    return out


def parse_sitemap(sitemaps: DataFrame, url_col: str = "url",
                  payload_col: str = "sitemap_xml") -> DataFrame:
    """(sitemap url, payload bytes/text) → exploded entry rows
    ``(sitemap_url, loc, lastmod, kind)`` via one Arrow-batched map —
    the ``parse_robots_rules`` shape. ``kind='url'`` rows feed the
    frontier candidate set; ``kind='sitemap'`` rows are child sitemaps
    for the crawl loop to fetch next cycle."""
    def run(batches: Iterable) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for su, payload in zip(pdf[url_col], pdf[payload_col]):
                for loc, lastmod, kind in parse_sitemap_urls(payload):
                    out.append((su, loc, lastmod, kind))
            yield pd.DataFrame(out, columns=["sitemap_url", "loc",
                                             "lastmod", "kind"])

    return sitemaps.select(url_col, payload_col).mapInPandas(
        run, schema="sitemap_url string, loc string, lastmod string, "
                    "kind string")
