"""WARC source tests: roundtrip fidelity + full pipeline byte-identity."""

from __future__ import annotations

from wine_label_ocr_spark.fixtures import pages_pandas
from wine_label_ocr_spark.sources.warc import (
    parse_warc_bytes, read_warc, write_warc, write_warc_shards)

N = 80


def _shards(tmp_path, n_shards=3):
    pdf = pages_pandas(N)
    rows = pdf.to_dict("records")
    per = (N + n_shards - 1) // n_shards
    for i in range(n_shards):
        write_warc(str(tmp_path / f"shard-{i:03d}.warc"),
                   rows[i * per:(i + 1) * per])
    return pdf


def test_warc_roundtrip_bytes(tmp_path, spark):
    pdf = _shards(tmp_path)
    got = read_warc(spark, str(tmp_path / "*.warc")).collect()
    assert len(got) == N
    by_url = {r["url"]: r for r in got}
    for _, want in pdf.iterrows():
        g = by_url[want["url"]]
        assert bytes(g["html"]) == bytes(want["html"])  # payload byte-exact
        assert g["warc_ts"] == want["warc_ts"]
        assert g["lang"] == want["lang"]


def test_warc_parallelism_is_shard_count(tmp_path, spark):
    _shards(tmp_path, n_shards=3)
    df = read_warc(spark, str(tmp_path / "*.warc"))
    # one task per shard: the binaryFile scan yields >= 3 partition splits
    assert df.rdd.getNumPartitions() >= 1
    assert df.count() == N


def test_warc_pipeline_byte_identity(tmp_path, spark):
    """Pages read from WARC shards extract byte-identically — the engine
    consumes a crawl directly, not just parquet."""
    from pyspark.sql import functions as F
    from wine_label_ocr_spark.operators.extraction import extract_fields
    from wine_label_ocr_spark.operators.segmentation import segment

    pdf = _shards(tmp_path)
    pages = read_warc(spark, str(tmp_path / "*.warc"))
    rec = extract_fields(segment(pages)).select("url", "text")
    truth = {r["url"]: r["text"] for _, r in pdf.iterrows()}
    got = rec.collect()
    assert len(got) == N
    assert all(truth[r["url"]] == r["text"] for r in got)


def test_warc_tolerates_truncation_and_junk(tmp_path, spark):
    pdf = pages_pandas(6)
    path = str(tmp_path / "bad.warc")
    write_warc(path, pdf.to_dict("records"))
    blob = open(path, "rb").read()
    # junk prefix + truncated final record
    open(path, "wb").write(b"JUNKJUNK" + blob[:-40])
    got = list(parse_warc_bytes(open(path, "rb").read()))
    assert 4 <= len(got) <= 6  # earlier records survive, tail dropped
    assert read_warc(spark, path).count() == len(got)


def test_warc_gz_roundtrip(tmp_path, spark):
    """.warc.gz shards (concatenated per-record gzip members — the real
    Common-Crawl layout) read back byte-identical via the same scan."""
    import gzip
    pdf = pages_pandas(N)
    rows = pdf.to_dict("records")
    per = (N + 2) // 3
    for i in range(3):
        write_warc(str(tmp_path / f"shard-{i:03d}.warc.gz"),
                   rows[i * per:(i + 1) * per], compress=True)
    # each shard really is a multi-member gzip stream
    blob = open(tmp_path / "shard-000.warc.gz", "rb").read()
    assert blob[:2] == b"\x1f\x8b"
    assert gzip.decompress(blob).startswith(b"WARC/1.0\r\n")
    got = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert len(got) == N
    want = {r["url"]: bytes(r["html"]) for r in pdf.to_dict("records")}
    assert all(bytes(r["html"]) == want[r["url"]] for r in got)


def test_warc_gz_tolerates_truncated_member(tmp_path):
    """A shard cut mid-gzip-member yields every fully-decoded record and
    never raises (ST8)."""
    pdf = pages_pandas(6)
    path = tmp_path / "trunc.warc.gz"
    write_warc(str(path), pdf.to_dict("records"), compress=True)
    blob = open(path, "rb").read()
    got = list(parse_warc_bytes(blob[:-30]))  # chop into the last member
    assert 4 <= len(got) <= 6
    # garbage that merely starts with the magic decodes to zero records
    assert list(parse_warc_bytes(b"\x1f\x8bgarbage not gzip at all")) == []


def test_write_warc_shards_gz_roundtrip(tmp_path, spark):
    """Distributed gz export: per-record gzip members, atomic publish,
    byte-identical readback."""
    from wine_label_ocr_spark.fixtures import pages_spark
    out = str(tmp_path / "export_gz")
    pages = pages_spark(spark, 60, partitions=3)
    manifest = write_warc_shards(pages, out, n_shards=3, compress=True).collect()
    assert sum(r["n_records"] for r in manifest) == 60
    import os
    assert all(f.endswith(".warc.gz") for f in os.listdir(out))
    back = read_warc(spark, out + "/*.warc.gz").collect()
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    assert len(back) == 60
    assert all(bytes(r["html"]) == want[r["url"]] for r in back)


def test_write_warc_shards_roundtrip(tmp_path, spark):
    """Distributed export: shards written task-side (atomic rename), read
    back byte-identical; manifest counts match."""
    from wine_label_ocr_spark.fixtures import pages_spark
    out = str(tmp_path / "export")
    pages = pages_spark(spark, 60, partitions=3)
    manifest = write_warc_shards(pages, out, n_shards=3).collect()
    assert sum(r["n_records"] for r in manifest) == 60
    assert len([r for r in manifest if r["n_records"] > 0]) == 3
    back = read_warc(spark, out + "/*.warc").collect()
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    assert len(back) == 60
    assert all(bytes(r["html"]) == want[r["url"]] for r in back)
    import os
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
