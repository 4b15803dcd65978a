"""wine_label_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-imagination of the capabilities of
``SrikarG30/wine-label-ocr`` (reference at /root/reference, read-only):
its detect-then-read structure (YOLO region detection + OCR field
extraction + fuzzy dedup against a JSONL store) becomes a two-stage DOM
pipeline over tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``:

* stage 1 (``operators.segmentation``): lexer-built block list with
  text-density / link-density features (the analog of
  ``hybrid.py:102-146`` heuristic region detection + ``hybrid.py:189-227``
  connected components), one ``mapInPandas`` over Arrow batches;
* stage 2 (``operators.extraction``): block classification + field
  extraction (title ≈ maker name, year ≈ vintage) in native
  ``pyspark.sql.functions`` (the analog of
  ``final_run_ocr.py:299-378``);
* dedup ingest (``operators.dedup``): exact key, then blocked fuzzy
  (the analog of ``scan_and_store.py:121-164``);
* similarity suite (``operators.similarity``): the analog of
  ``similarity_functions/*``.

Everything is DataFrame-first; heavy per-document work is vectorized
pandas/Arrow UDFs (no per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"
