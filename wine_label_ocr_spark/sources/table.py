"""Snapshot-committed parquet table (Iceberg-semantics fallback).

The reference's store is an append-only JSONL file keyed by record id
(``hybrid.py:54-64,270-271``; ``scan_and_store.py:58-119``). At scale the
design target is an Iceberg table (append / merge / snapshot); the Iceberg
runtime jar is not available offline (SURVEY.md §7.3.4), so this module
implements the same commit semantics on plain parquet:

* a table is a directory with immutable data files plus ``_manifest.json``;
* every write creates new files then commits a new snapshot via an atomic
  manifest swap (``os.replace``) — readers never see partial writes;
* snapshots form a linear history; time-travel by snapshot id;
* ``merge_insert`` = INSERT-iff-NOT-MATCHED (the reference's
  "append iff decision == not seen", ``scan_and_store.py:234-235``).

Only the manifest swap is driver-side; all data moves stay distributed.
At 100 TB the manifest would hold file-level stats for pruning — here it
records per-commit row counts and lineage metadata (run id, bucket), which
doubles as the resume/metrics journal.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


class ManifestTable:
    """A parquet-backed table with atomic snapshot commits."""

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": [], "current": None}
        with open(self.manifest_path, encoding="utf-8") as f:
            return json.load(f)

    def _commit(self, manifest: dict[str, Any]) -> None:
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def snapshots(self) -> list[dict[str, Any]]:
        return self._load()["snapshots"]

    def current_files(self, snapshot_id: int | None = None) -> list[str]:
        m = self._load()
        if m["current"] is None:
            return []
        sid = m["current"] if snapshot_id is None else snapshot_id
        for s in m["snapshots"]:
            if s["id"] == sid:
                return s["files"]
        raise KeyError(f"snapshot {snapshot_id} not found")

    # -- read --------------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame | None:
        files = self.current_files(snapshot_id)
        if not files:
            return None
        return spark.read.parquet(*files)

    def is_empty(self) -> bool:
        return not self.current_files()

    # -- write -------------------------------------------------------------

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        out = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex}")
        df.write.mode("errorifexists").parquet(out)
        files = sorted(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".parquet"))
        return files, len(files)

    def append(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        """Write df's files, then commit prev ∪ new as a new snapshot (S3)."""
        files, _ = self._write_files(df)
        m = self._load()
        prev = self.current_files() if m["current"] is not None else []
        sid = (m["current"] or 0) + 1
        m["snapshots"].append({
            "id": sid, "op": "append", "ts": time.time(),
            "files": prev + files, "new_files": files,
            "meta": meta or {},
        })
        m["current"] = sid
        self._commit(m)
        return sid

    def overwrite(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        files, _ = self._write_files(df)
        m = self._load()
        sid = (m["current"] or 0) + 1
        m["snapshots"].append({
            "id": sid, "op": "overwrite", "ts": time.time(),
            "files": files, "new_files": files, "meta": meta or {},
        })
        m["current"] = sid
        self._commit(m)
        return sid

    def vacuum(self) -> int:
        """Delete data files unreachable from the CURRENT snapshot.

        The Iceberg expire-snapshots analog; rollbacks (resumable runs)
        orphan files rather than deleting them inline, so vacuum is the
        explicit, separate destructive step. History is truncated to the
        current snapshot. Returns the number of files removed.
        """
        m = self._load()
        live = set(self.current_files())
        removed = 0
        for root, _, files in os.walk(self.data_dir):
            for f in files:
                p = os.path.join(root, f)
                if f.endswith(".parquet") and p not in live:
                    os.remove(p)
                    removed += 1
        if m["current"] is not None:
            cur = [s for s in m["snapshots"] if s["id"] == m["current"]]
            m["snapshots"] = cur
            self._commit(m)
        return removed

    def merge_insert(self, spark: SparkSession, df: DataFrame, key: str,
                     meta: dict[str, Any] | None = None) -> int:
        """MERGE … WHEN NOT MATCHED THEN INSERT (S4/J11).

        Spark plan: left_anti join of the incoming batch against the current
        table on ``key``, then append. The anti join broadcasts the smaller
        side under AQE; at scale the store side would be pruned by partition
        stats before the join.
        """
        cur = self.read(spark)
        new = df.dropDuplicates([key])
        if cur is not None:
            new = new.join(cur.select(key), key, "left_anti")
        return self.append(new, meta=meta)
