"""JSONL record store scans/sinks — the reference's storage layer, exactly.

* S1 — keyed JSONL scan with last-write-wins on the record key
  (``load_database``, hybrid.py:54-64: later lines overwrite earlier dict
  entries). Spark restatement: explicit schema read + ranked-window dedup
  keeping the highest line/file position per key.
* S2 — polymorphic scan: jsonl → full records with field repair;
  txt → ``MAKER|VINTAGE`` key lines (``load_db``,
  scan_and_store.py:58-106). Field repair = explicit schema + coalesce
  defaults; blank/comment lines are filtered (P10).
* S3 — append sink (``save_wine_record``/``append_db``, hybrid.py:270-271,
  scan_and_store.py:108-119) → ManifestTable.append.
* S4 — conditional upsert ("append iff not seen",
  scan_and_store.py:234-235) → ManifestTable.merge_insert.

At scale the JSONL store is replaced by the snapshot table
(sources/table.py); this module exists so existing JSONL stores read
bit-compatibly during migration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

RECORD_SCHEMA = ("wine_id string, CustomID string, MakerName string, "
                 "Vintage int, Barcode string, "
                 "timestamp double")


def load_database(spark: SparkSession, path: str,
                  key: str = "wine_id") -> DataFrame:
    """S1 — last-write-wins keyed load (hybrid.py:54-64).

    The reference loads sequentially into a dict, so the LAST line for a
    key wins. Order is pinned by (file name, line index within file) via a
    wholetext read + posexplode — monotonically_increasing_id over a split
    read follows partition index, and Spark bin-packs splits by SIZE, so a
    large file's splits could be mis-ranked (ADVICE r1). wholetext makes
    the per-file line index exact at the cost of one task per file; a
    migration-scale store is sharded into many files, so parallelism comes
    from file count, exactly like gzip-compressed inputs.
    """
    raw = (spark.read.text(path, wholetext=True)
           .select(F.element_at(F.split(F.input_file_name(), "/"), -1)
                   .alias("_file"),
                   F.posexplode(F.split("value", r"\r?\n"))
                   .alias("_pos", "value")))
    # P10: blank / comment lines are skipped (hybrid.py:60)
    raw = raw.filter((F.length(F.trim("value")) > 0)
                     & ~F.trim("value").startswith("#"))
    rec = raw.select(
        F.from_json("value", RECORD_SCHEMA).alias("r"), "_file", "_pos"
    ).select("r.*", "_file", "_pos")
    w = W.partitionBy(key).orderBy(F.col("_file").desc(), F.col("_pos").desc())
    return (rec.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_file", "_pos")
            .filter(F.col(key).isNotNull()))


def load_db_txt(spark: SparkSession, path: str) -> DataFrame:
    """S2 (txt flavor) — parse ``MAKER|VINTAGE`` key lines
    (scan_and_store.py:88-97), with the empty-key guard (P8)."""
    raw = spark.read.text(path)
    raw = raw.filter((F.length(F.trim("value")) > 0)
                     & ~F.trim("value").startswith("#"))
    parts = F.split(F.trim("value"), r"\|", 2)
    maker = F.nullif(F.trim(F.get(parts, 0)), F.lit(""))
    vintage = F.when(F.get(parts, 1).rlike(r"^\d{4}$"),
                     F.get(parts, 1).cast("int"))
    out = raw.select(maker.alias("maker_name"), vintage.alias("vintage"))
    # P8: refuse records with neither maker nor vintage (scan_and_store.py:199-209)
    return out.filter(~(F.col("maker_name").isNull() & F.col("vintage").isNull()))


def repair_fields(df: DataFrame) -> DataFrame:
    """S2 field repair (scan_and_store.py:99-105): dynamic dict-repair
    becomes explicit NULL-safe defaults — NULL means missing, everywhere
    (SURVEY.md §7.3.6)."""
    cols = {c: F.col(c) for c in df.columns}
    if "CustomID" in cols and "MakerName" in cols and "Vintage" in cols:
        rebuilt = F.when(
            F.col("CustomID").isNull() & F.col("MakerName").isNotNull()
            & F.col("Vintage").isNotNull(),
            F.concat_ws("|", F.col("MakerName"), F.col("Vintage").cast("string")))
        df = df.withColumn("CustomID", F.coalesce(F.col("CustomID"), rebuilt))
    return df
