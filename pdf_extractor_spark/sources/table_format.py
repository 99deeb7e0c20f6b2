"""Iceberg-style table format emulation over Parquet (SURVEY.md §7).

The sandbox has no Iceberg jars, so the north rule's snapshot/lineage/resume
semantics are provided by a thin, from-scratch table layout:

    <root>/data/snap-<id>/part-*.parquet      immutable data files per commit
    <root>/_snapshots/<id>.json               manifest: data dirs + op + summary
    <root>/_snapshots/CURRENT                 pointer file (atomic rename commit)

Commits are atomic: data is written to a staging dir, the manifest json is
written to a temp name and ``os.replace``d into place, then CURRENT is
replaced. Readers resolve CURRENT → manifest → data dirs. ``overwrite``
replaces the logical table; ``append`` unions with the parent snapshot —
the same append/overwrite granularity the reference achieves with
soft-delete + re-insert (main.py:1751-1776). On a real cluster the same
call-sites bind to Iceberg (``writeTo(...).append()`` /
``overwritePartitions()``) — see pipeline.py docstring.
"""
from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str) -> None:
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _current_id(self) -> str | None:
        cur = os.path.join(self.snap_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def current_manifest(self) -> dict | None:
        sid = self._current_id()
        if sid is None:
            return None
        with open(os.path.join(self.snap_dir, f"{sid}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.snap_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.snap_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # -- commit protocol ----------------------------------------------------
    def _commit(self, df: DataFrame, op: str, summary: dict | None) -> str:
        sid = uuid.uuid4().hex[:16]
        snap_data = os.path.join(self.data_dir, f"snap-{sid}")
        staging = snap_data + ".staging"
        df.write.mode("overwrite").parquet(staging)
        os.replace(staging, snap_data)  # atomic publish of the data dir

        parent = self.current_manifest()
        if op == "append" and parent is not None:
            dirs = parent["data_dirs"] + [snap_data]
        else:
            dirs = [snap_data]
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"] if parent else None,
            "op": op,
            "data_dirs": dirs,
            "summary": summary or {},
        }
        tmp = os.path.join(self.snap_dir, f".{sid}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.snap_dir, f"{sid}.json"))
        cur_tmp = os.path.join(self.snap_dir, ".CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(sid)
        os.replace(cur_tmp, os.path.join(self.snap_dir, "CURRENT"))
        return sid

    def append(self, df: DataFrame, summary: dict | None = None) -> str:
        return self._commit(df, "append", summary)

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> str:
        return self._commit(df, "overwrite", summary)

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        m = self.current_manifest()
        if m is None or not m["data_dirs"]:
            return None
        return spark.read.parquet(*m["data_dirs"])

    def read_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Time travel: read the table as of a given snapshot."""
        with open(os.path.join(self.snap_dir, f"{snapshot_id}.json")) as f:
            m = json.load(f)
        return spark.read.parquet(*m["data_dirs"])

    def expire_orphans(self) -> int:
        """Drop data dirs unreachable from the current snapshot chain."""
        live: set[str] = set()
        m = self.current_manifest()
        if m:
            live.update(m["data_dirs"])
        removed = 0
        for name in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, name)
            if p not in live:
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        return removed
