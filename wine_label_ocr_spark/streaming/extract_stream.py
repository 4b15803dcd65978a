"""The flagship extraction pipeline as a Structured Streaming query.

The batch plan (``plans.pipeline.extract_records``) is a pure map —
parquet scan → ``mapInPandas`` segmentation → native field extraction,
zero shuffles — which is exactly the shape Structured Streaming lifts
verbatim: the SAME DataFrame program runs over a file-source stream with
no operator changes, so stream output ≡ batch output on the same pages by
construction (pinned by ``tests/test_streaming.py``). Reference analog:
the watcher loop in ``camera_scan.py`` / ``scan_and_store.py`` that OCRs
files as they appear — restated as a checkpointed incremental query.

Scale/ops notes:

* The file source commits PROCESSED FILES to the checkpoint, so a killed
  job restarted on the same checkpoint resumes with the unprocessed files
  only — exactly-once records in the output (no reprocessing, no gaps).
  That is the streaming twin of the bucket-resume protocol in
  ``plans.resumable``.
* ``maxFilesPerTrigger`` bounds per-micro-batch work (backpressure);
  ``availableNow`` drains everything present, in bounded batches, then
  stops — the catch-up/backfill trigger.
* The sink is an append-only parquet directory: segmentation emits one
  record per page independent of other pages (no aggregation state), so
  append mode needs no watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fixtures import PAGES_DDL
from ..plans.pipeline import extract_records


def pages_stream(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of pages (the streaming twin of
    ``spark.read.parquet(pages)``). The schema must be declared up front —
    streaming sources cannot infer it."""
    r = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def extract_records_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming flagship: identical plan to the batch extract_records."""
    return extract_records(pages_stream(spark, input_dir,
                                        max_files_per_trigger))


def run_extract_stream(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str,
                       max_files_per_trigger: int | None = None):
    """Drain all currently-available pages into the records sink
    (``availableNow``), exactly once across restarts via the checkpoint.
    Blocks until the drain completes; returns the finished query.
    """
    rec = extract_records_stream(spark, input_dir, max_files_per_trigger)
    q = (rec.writeStream.format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 ts_col: str | None = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival per content key
    (whitespace-canonicalized md5, same key as the batch
    ``dedupe.exact_dedup``) — the ingest-time twin of batch dedup for a
    continuously-arriving crawl.

    With ``ts_col`` set, ``dropDuplicatesWithinWatermark`` bounds the
    key state to the watermark horizon — the production shape: state
    size is (keys seen within the lateness window), not (keys ever
    seen), so the query runs forever. Without ``ts_col`` the state is
    unbounded (backfill/drain jobs only, e.g. ``availableNow``).

    First-arrival-wins differs from the batch min-id tie-break by
    design: a stream has an arrival order, a snapshot doesn't; on the
    same single drain both keep exactly one row per key (pinned by
    test)."""
    from ..operators.dedupe import content_key
    keyed = stream_df.withColumn("_ck", content_key(F.col(text_col)))
    if ts_col is not None:
        out = (keyed.withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_ck"]))
    else:
        out = keyed.dropDuplicates(["_ck"])
    return out.drop("_ck")
