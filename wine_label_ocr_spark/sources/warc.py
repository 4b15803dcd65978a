"""WARC source — Common-Crawl's native container format as an input.

The north rule's input is "Common-Crawl-style web pages"; at 100 TB those
arrive as sharded ``.warc`` files (~1 GB each), not parquet. This module
adds a distributed WARC reader so a user can point the engine straight at
a crawl: ``binaryFile`` scan (one task per shard — exactly how
Common-Crawl parallelism works, thousands of shards) → Arrow-batched
``mapInPandas`` record splitter → the same pages schema
``(url, warc_ts, html, lang)`` the rest of the pipeline consumes.

Format handled (public WARC/1.0 subset): records of

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (headers)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                        (record separator)

``response`` records come in two real-world layouts, both handled:

* bare payload — the record body IS the page bytes
  (WARC-Identified-Payload-Type style of storage; what this module's
  own writers emit by default);
* HTTP-enveloped — the Common-Crawl layout: the WARC header carries
  ``Content-Type: application/http; msgtype=response`` and the body is
  a full captured HTTP response (status line + headers + CRLFCRLF +
  entity). The envelope is stripped, a chunked transfer-encoding is
  de-chunked (tolerantly), and the HTTP ``Content-Type`` charset — the
  highest-priority charset source per RFC 9110 §8.3, above any
  ``<meta charset>`` in the markup — is surfaced as the
  ``http_charset`` column and fed to the extractor's charset pick
  (``oracle.detect_charset``). Reference analog: the tolerant
  polymorphic scan S2 (scan_and_store.py:58-106) that accepts both the
  raw and the wrapped form of its inputs.

Other record types (warcinfo, request, metadata) are skipped. Truncated
trailing records are dropped, not fatal (ST8 tolerant-parse policy).

Gzip: real Common-Crawl shards are ``.warc.gz`` — a CONCATENATION of
per-record gzip members (that is what makes record-level random access
possible via the crawl indexes). ``parse_warc_bytes`` auto-detects the
gzip magic and inflates member-by-member with stdlib zlib, tolerating a
truncated trailing member (ST8); writers emit one deterministic gzip
member per record (``mtime=0``) when ``compress=True``.

Scale notes: parallelism = shard count (a WARC shard is not splittable
mid-record, the same constraint gzip imposes on real crawls); per-task
memory is one shard. Writers shard accordingly (``write_warc`` in
fixtures/tests writes one shard per call).
"""

from __future__ import annotations

import gzip as _gzip
import re as _re
import zlib as _zlib
from collections.abc import Iterable, Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_PAGES_DDL = ("url string, warc_ts timestamp, html binary, lang string, "
                  "http_charset string")

_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"

# charset token inside an HTTP Content-Type header value
_HTTP_CHARSET_RE = _re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_-]+)",
                               _re.IGNORECASE)


def format_warc_record(url: str, warc_ts: datetime, payload: bytes,
                       lang: str | None = None,
                       record_type: str = "response",
                       http_envelope: bool = False,
                       http_content_type: str | None = None,
                       refers_to_url: str | None = None,
                       refers_to_ts: datetime | None = None,
                       payload_digest: str | None = None) -> bytes:
    """One WARC/1.0 record (deterministic byte layout for golden tests).

    ``http_envelope=True`` writes the Common-Crawl layout: the WARC header
    gains ``Content-Type: application/http; msgtype=response`` and the body
    becomes a full HTTP/1.1 response (status line, ``Content-Type`` from
    ``http_content_type`` — default ``text/html`` with the charset the
    extractor would detect from the payload — then the entity bytes).

    ``record_type="revisit"`` writes the WARC 1.1 identical-payload-
    digest profile: an EMPTY body plus ``WARC-Profile``,
    ``WARC-Refers-To-Target-URI``/``-Date`` (the original capture) and
    ``WARC-Payload-Digest: sha1:<base32>`` — a ~200-byte pointer in
    place of the payload, the cross-crawl storage dedup Common Crawl
    ships (see ``operators.cdx.revisit_records``)."""
    body = payload
    extra: list[tuple[str, str]] = []
    if record_type == "revisit":
        body = b""
        extra = [("WARC-Profile",
                  "http://netpreserve.org/warc/1.1/revisit/"
                  "identical-payload-digest")]
        if refers_to_url is not None:
            extra.append(("WARC-Refers-To-Target-URI", refers_to_url))
        if refers_to_ts is not None:
            extra.append(("WARC-Refers-To-Date",
                          refers_to_ts.strftime(_DATE_FMT)))
        if payload_digest is not None:
            extra.append(("WARC-Payload-Digest", f"sha1:{payload_digest}"))
    if http_envelope and record_type == "response":
        if http_content_type is None:
            from ..oracle import detect_charset
            http_content_type = f"text/html; charset={detect_charset(payload)}"
        body = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Type: {http_content_type}\r\n".encode("utf-8")
                + f"Content-Length: {len(payload)}\r\n\r\n".encode("utf-8")
                + payload)
        extra = [("Content-Type", "application/http; msgtype=response")]
    headers = [
        ("WARC-Type", record_type),
        ("WARC-Target-URI", url),
        ("WARC-Date", warc_ts.strftime(_DATE_FMT)),
        *extra,
    ]
    if lang is not None:
        headers.append(("WARC-Identified-Content-Language", lang))
    headers.append(("Content-Length", str(len(body))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers) + b"\r\n"
    return head + body + b"\r\n\r\n"


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoding body.

    Tolerant (ST8): any malformed chunk framing returns the body as-is
    rather than raising — a wrongly-labelled record degrades to the raw
    capture instead of killing the shard.
    """
    out = []
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return body
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        if size == 0:
            break  # terminal chunk; trailers (if any) are discarded
        start = eol + 2
        if start + size > n:
            return body
        # the chunk must be followed by its CRLF separator (or end the
        # body); anything else is malformed framing → degrade to raw
        sep = body[start + size:start + size + 2]
        if sep and sep != b"\r\n":
            return body
        out.append(body[start:start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF
    return b"".join(out)


def strip_http_envelope(body: bytes) -> tuple[bytes, str | None]:
    """Split a captured HTTP response message into (entity bytes, charset).

    Returns the bytes after the header block, de-chunked when the headers
    declare ``Transfer-Encoding: chunked``, plus the ``charset=`` token of
    the HTTP ``Content-Type`` header (or None). Tolerant: anything that
    does not look like an HTTP message comes back unchanged with charset
    None, so bare-payload records flow through untouched.
    """
    if not body.startswith(b"HTTP/"):
        return body, None
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return body, None
    charset = None
    chunked = False
    for line in body[:head_end].split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if not sep:
            continue
        key = k.strip().lower()
        if key == b"content-type":
            m = _HTTP_CHARSET_RE.search(v)
            if m:
                charset = m.group(1).decode("ascii", "replace").lower()
        elif key == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
    entity = body[head_end + 4:]
    if chunked:
        entity = _dechunk(entity)
    return entity, charset


def gzip_member(record: bytes) -> bytes:
    """One record → one deterministic gzip member (mtime=0, no filename) —
    the Common-Crawl ``.warc.gz`` convention: members concatenate into a
    shard and each record stays independently random-accessible."""
    return _gzip.compress(record, compresslevel=6, mtime=0)


def gunzip_members(blob: bytes) -> bytes:
    """Inflate a concatenation of gzip members back to plain WARC bytes.

    Tolerant (ST8): a corrupt or truncated trailing member ends the shard
    with everything decoded so far, never raises.
    """
    out = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = _zlib.decompressobj(31)  # 31 = gzip wrapper
        try:
            out.append(d.decompress(data))
        except _zlib.error:
            break
        if not d.eof:
            break  # truncated trailing member — keep what decoded
        data = d.unused_data
    return b"".join(out)


def write_warc(path: str, rows: Iterable[dict], compress: bool = False,
               http_envelope: bool = False) -> int:
    """Write one WARC shard from dicts with (url, warc_ts, html[, lang]).

    Fixture/test helper (driver-side by design: a shard is a single
    sequential file). ``compress=True`` writes per-record gzip members
    (the ``.warc.gz`` layout); ``http_envelope=True`` wraps each response
    body in a real HTTP envelope (the Common-Crawl layout). Returns the
    number of records written.
    """
    pack = gzip_member if compress else (lambda b: b)
    n = 0
    with open(path, "wb") as f:
        f.write(pack(format_warc_record(
            "urn:warcinfo", datetime(2025, 1, 1, tzinfo=timezone.utc),
            b"software: wine_label_ocr_spark\r\n", record_type="warcinfo")))
        for r in rows:
            f.write(pack(format_warc_record(r["url"], r["warc_ts"], r["html"],
                                            r.get("lang"),
                                            http_envelope=http_envelope)))
            n += 1
    return n


def parse_warc_bytes(
        blob: bytes,
        record_types: tuple[str, ...] = ("response",),
) -> Iterator[tuple[str, datetime, bytes, str | None, str | None]]:
    """Split one shard's bytes into (url, ts, payload, lang, http_charset).

    Pure function (stdlib only) shared by the Spark reader and tests.
    Gzipped shards (``.warc.gz`` — concatenated per-record members) are
    detected by magic and inflated first. Response records whose WARC
    ``Content-Type`` is ``application/http`` (or whose body plainly starts
    with an HTTP status line — some writers omit the header) have the HTTP
    envelope stripped: ``payload`` is the entity bytes and ``http_charset``
    the HTTP ``Content-Type`` charset token (None when absent). Bare
    payloads pass through with charset None. Tolerant: malformed/truncated
    records end the shard instead of raising.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    pos = 0
    n = len(blob)
    while True:
        start = blob.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            return
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start + 10:head_end].split(b"\r\n"):
            k, sep, v = line.partition(b": ")
            if sep:
                headers[k.decode("utf-8", "replace").lower()] = \
                    v.decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated trailing record — tolerated, dropped
        pos = body_start + length
        if headers.get("warc-type") not in record_types:
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        try:
            ts = datetime.strptime(headers.get("warc-date", ""), _DATE_FMT)
        except ValueError:
            ts = None
        body = blob[body_start:pos]
        http_charset = None
        # sniff only a REAL status line ("HTTP/1.x NNN ") when the WARC
        # header is silent — a bare text payload that merely begins with
        # the word "HTTP/1.1" must not lose its head to the stripper
        if (headers.get("content-type", "").startswith("application/http")
                or _re.match(rb"HTTP/\d\.\d \d{3}[ \r]", body[:16])):
            body, http_charset = strip_http_envelope(body)
        yield url, ts, body, \
            headers.get("warc-identified-content-language"), http_charset


def write_warc_shards(pages: DataFrame, out_dir: str,
                      n_shards: int | None = None,
                      compress: bool = False,
                      http_envelope: bool = False,
                      record_type: str = "response") -> DataFrame:
    """Distributed WARC export: one shard file per partition, written
    task-side with a write-tmp-then-atomic-rename protocol (a crashed task
    leaves only a .tmp orphan, never a half shard with a final name).
    Returns the shard manifest (path, n_records, n_bytes) as a DataFrame —
    collect it to commit the export.

    The inverse of ``read_warc``: a corpus curated in the engine ships
    back out in Common-Crawl's container for downstream consumers.
    """
    import os
    import uuid as _uuid
    from collections.abc import Iterable, Iterator

    os.makedirs(out_dir, exist_ok=True)
    if n_shards is not None:
        pages = pages.repartition(n_shards)

    def write_partition(batches: Iterable) -> Iterator:
        import pandas as pd

        def _dt(v):
            return (None if v is None or pd.isna(v)
                    else pd.Timestamp(v).to_pydatetime())

        name = f"shard-{_uuid.uuid4().hex}.warc" + (".gz" if compress else "")
        tmp = os.path.join(out_dir, name + ".tmp")
        final = os.path.join(out_dir, name)
        pack = gzip_member if compress else (lambda b: b)
        n = n_bytes = 0
        f = None
        for pdf in batches:
            if f is None:
                f = open(tmp, "wb")
            for r in pdf.itertuples(index=False):
                # per-row record type (the revisit_records shape)
                # overrides the sink-level default; revisit rows carry
                # no payload — the pointer headers replace it
                rt = getattr(r, "record_type", None) or record_type
                payload = (bytes(r.html)
                           if getattr(r, "html", None) is not None else b"")
                rec = pack(format_warc_record(
                    r.url, pd.Timestamp(r.ts).to_pydatetime(),
                    payload, getattr(r, "lang", None),
                    record_type=rt,
                    http_envelope=http_envelope,
                    refers_to_url=getattr(r, "refers_to_url", None),
                    refers_to_ts=_dt(getattr(r, "refers_to_ts", None)),
                    payload_digest=getattr(r, "digest", None)))
                f.write(rec)
                n += 1
                n_bytes += len(rec)
        if f is None:
            yield pd.DataFrame(columns=["path", "n_records", "n_bytes"])
            return
        f.close()
        os.replace(tmp, final)  # atomic publish
        yield pd.DataFrame([(final, n, n_bytes)],
                           columns=["path", "n_records", "n_bytes"])

    cols = [c for c in ("url", "warc_ts", "html", "lang", "record_type",
                        "refers_to_url", "refers_to_ts", "digest")
            if c in pages.columns]
    sel = pages.select(*cols).withColumnRenamed("warc_ts", "ts")
    return sel.mapInPandas(
        write_partition, schema="path string, n_records long, n_bytes long")


def export_deduped_warc(pages: DataFrame, out_dir: str,
                        n_shards: int | None = None,
                        compress: bool = False) -> DataFrame:
    """Deduplicated WARC export: classify captures with
    ``operators.cdx.revisit_records`` (WARC 1.1 identical-payload-digest
    profile) and ship ONE full ``response`` per distinct (surt, digest)
    plus ~200-byte ``revisit`` pointers for every repeat — the
    Common-Crawl cross-crawl storage shape. Returns the shard manifest;
    at archive scale (most captures unchanged between crawls) the
    byte cut approaches the corpus duplication rate."""
    from ..operators.cdx import revisit_records
    rv = revisit_records(pages, keep_payload=True)
    return write_warc_shards(
        rv.withColumnRenamed("ts", "warc_ts"),
        out_dir, n_shards=n_shards, compress=compress)


def read_warc(spark: SparkSession, path_glob: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Distributed WARC scan → pages DataFrame (url, warc_ts, html, lang).

    One input row (= one task) per shard via the binaryFile source; the
    record splitter runs as a pure map, so everything downstream
    (segment → extract) pipelines exactly as it does from parquet.
    """
    def split(batches: Iterable) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                b = bytes(blob) if not isinstance(blob, bytes) else blob
                rows.extend(parse_warc_bytes(b, record_types))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "lang", "http_charset"])

    return (spark.read.format("binaryFile").load(path_glob)
            .select("content")
            .mapInPandas(split, schema=WARC_PAGES_DDL))


def build_wat_records(pages: DataFrame, url_col: str = "url",
                      ts_col: str = "warc_ts",
                      html_col: str = "html") -> DataFrame:
    """pages → WAT-style metadata rows ``(url, warc_ts, html=json bytes,
    lang=null)``: per page, a JSON envelope in the Common-Crawl WAT
    shape — WARC header echo plus HTML metadata (head title, outlink
    list). Built ENTIRELY with JVM column algebra (``to_json`` over a
    nested struct; links via the shared ``graph.href_values`` helper),
    so the sidecar derivation is a pure map feeding the same
    distributed shard writer as the corpus itself
    (``write_wat_shards``)."""
    from ..operators.graph import href_values

    html_str = F.col(html_col).cast("string")
    title = F.nullif(
        F.regexp_extract(html_str, r"(?i:<title[^>]*>)([^<]*)", 1), F.lit(""))
    links = F.transform(
        href_values(html_str), lambda u: F.struct(u.alias("url")))
    envelope = F.struct(
        F.struct(
            F.col(url_col).alias("WARC-Target-URI"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
             .alias("WARC-Date"),
            F.lit("response").alias("WARC-Type"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    F.struct(title.alias("Title")).alias("Head"),
                    links.alias("Links"),
                ).alias("HTML-Metadata"),
            ).alias("HTTP-Response-Metadata"),
        ).alias("Payload-Metadata"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.to_json(F.struct(envelope.alias("Envelope")),
                  {"ignoreNullFields": "false"}).cast("binary").alias("html"))


def write_wat_shards(pages: DataFrame, out_dir: str,
                     n_shards: int | None = None,
                     compress: bool = True) -> DataFrame:
    """Distributed WAT sidecar export: the Common-Crawl metadata
    companion of a WARC/WET corpus — one ``metadata``-type WARC record
    per page whose body is the JSON envelope from
    ``build_wat_records``. Same one-shard-per-task atomic writer as
    ``write_warc_shards``; returns the shard manifest."""
    return write_warc_shards(build_wat_records(pages), out_dir,
                             n_shards=n_shards, compress=compress,
                             record_type="metadata")


def html_to_text(html: Column) -> Column:
    """WET-style plain-text conversion of an HTML column — the Common
    Crawl ``conversion`` record body. Deliberately the simple, declared
    flavor (the full block-aware extraction is the certified lexer
    pipeline; WET wants the whole-page text):

    * ``<script>``/``<style>`` blocks dropped with their content;
    * remaining tags dropped; HTML comments dropped;
    * the 5 basic entities unescaped (incl. the ``&#39;`` apostrophe
      form; ``&amp;`` last, so double-escapes stay escaped);
    * runs of whitespace collapsed to one space, ends trimmed.

    Pure JVM column algebra on shared Java∩RE2 regexes (the DuckDB
    oracle runs the very same chain), so the conversion is a pure map
    at any scale."""
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                    ("&#39;", "'"), ("&apos;", "'")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))  # last: &amp;lt; stays &lt;
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def build_wet_records(pages: DataFrame, url_col: str = "url",
                      ts_col: str = "warc_ts",
                      html_col: str = "html") -> DataFrame:
    """pages → WET-style rows ``(url, warc_ts, html=utf-8 text bytes,
    lang=null)``: the ``conversion``-record body is the page's plain
    text per ``html_to_text``. Pure map (JVM regex chain), feeding the
    same distributed atomic shard writer as WARC/WAT — together the
    three exports complete the Common-Crawl container triad."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.encode(html_to_text(F.col(html_col).cast("string")), "utf-8")
         .alias("html"))


def write_wet_shards(pages: DataFrame, out_dir: str,
                     n_shards: int | None = None,
                     compress: bool = True) -> DataFrame:
    """Distributed WET export: one ``conversion`` WARC record per page
    whose body is the extracted plain text — Common Crawl's WET
    companion files. Same one-shard-per-task atomic writer; returns the
    shard manifest. Read back with
    ``read_warc(record_types=("conversion",))``."""
    return write_warc_shards(build_wet_records(pages), out_dir,
                             n_shards=n_shards, compress=compress,
                             record_type="conversion")
