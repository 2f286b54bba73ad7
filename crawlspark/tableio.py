"""Snapshot table store — Iceberg-style ACID semantics on plain parquet.

The north rule wants frontier/seen/robots/lineage state checkpointed to
Iceberg so any round is resumable. This sandbox has no Iceberg runtime
jar (offline), so ``SnapshotCatalog`` provides the subset of Iceberg
semantics the engine actually relies on (SURVEY §7):

* **Atomic commit**: each round writes new immutable parquet under
  ``<root>/<table>/snap-<n>/``, then atomically renames a manifest JSON
  into place (``os.replace``). Readers only ever see a committed
  manifest → snapshot isolation; a killed writer leaves garbage data
  files but an intact previous manifest → resume-safe.
* **Time travel**: ``read(table, snapshot_id=...)``.
* **Lineage + counters**: the manifest records, per commit, the round,
  per-stage row counters and per-partition lineage entries supplied by
  the caller.

On a real cluster the same interface maps 1:1 onto Iceberg
(``writeTo(...).createOrReplace`` / ``MERGE INTO`` / snapshot reads);
``use_iceberg=True`` is the config hook for that (requires the runtime
jar on the classpath — intentionally not exercised here).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, root: str, spark: SparkSession, use_iceberg: bool = False):
        if use_iceberg:
            raise NotImplementedError(
                "Iceberg backend requires iceberg-spark-runtime on the "
                "classpath; offline sandbox uses the snapshot-parquet store."
            )
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "manifest.json")

    def _load_manifest(self, table: str) -> dict | None:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def current_snapshot(self, table: str) -> int | None:
        m = self._load_manifest(table)
        return None if m is None else m["current"]

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    # -- IO -----------------------------------------------------------------
    def write(
        self,
        table: str,
        df: DataFrame,
        round_no: int | None = None,
        lineage: list[dict] | None = None,
        counters: dict[str, Any] | None = None,
        mode: str = "overwrite",
        base_round: int | None = None,
    ) -> int:
        """Commit a new snapshot of ``table`` atomically; returns its id.

        ``mode='overwrite'`` — the snapshot is exactly ``df``.
        ``mode='append'`` — the snapshot is base data ∪ ``df``; only the
        delta is written (immutable data dirs are shared between
        snapshots, Iceberg-style), so appending to a 100 TB table costs
        O(delta), not O(table). The base is the latest snapshot, or —
        when ``base_round`` is given — the latest snapshot with
        ``round <= base_round``; basing appends on the last *complete*
        round makes a replayed (crashed) round idempotent: its orphan
        append is never referenced again.
        """
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        manifest = self._load_manifest(table) or {"current": -1, "snapshots": []}
        snap_id = manifest["current"] + 1
        data_dir = f"snap-{snap_id:06d}"
        df.write.mode("overwrite").parquet(os.path.join(tdir, data_dir))
        dirs = [data_dir]
        if mode == "append" and manifest["snapshots"]:
            if base_round is None:
                base = manifest["snapshots"][-1]
            else:
                prior = [
                    e
                    for e in manifest["snapshots"]
                    if e["round"] is not None and e["round"] <= base_round
                ]
                base = prior[-1] if prior else None
            if base is not None:
                if base.get("buckets"):
                    # an append composed from base["dirs"] alone would
                    # silently drop every bucketed row (ADVICE r2) —
                    # no caller mixes the modes; fail loudly if one does
                    raise ValueError(
                        f"table {table}: append onto a bucketed snapshot "
                        f"(id {base['id']}) is not supported — use "
                        "write_bucketed"
                    )
                dirs = base["dirs"] + dirs
        entry = {
            "id": snap_id,
            "round": round_no,
            "committed_at": time.time(),
            "dirs": dirs,
            "schema": df.schema.json(),
            "lineage": lineage or [],
            "counters": counters or {},
        }
        manifest["snapshots"].append(entry)
        manifest["current"] = snap_id
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))  # the atomic commit point
        return snap_id

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        touched: list[int],
        round_no: int | None = None,
        lineage: list[dict] | None = None,
        counters: dict[str, Any] | None = None,
        base_round: int | None = None,
    ) -> int:
        """Bucket-granular snapshot commit (the Iceberg MERGE INTO
        shape): ``df`` holds ONLY the rows of the ``touched`` hash
        buckets (under an int ``_bucket`` column); untouched buckets
        keep referencing their previous immutable data dirs, so a merge
        into a 10^10-row table costs O(touched buckets), not O(table).

        The manifest entry records ``buckets: {bucket: dir}``; readers
        compose the table from the per-bucket dirs (the ``_bucket``
        partition column is path-encoded and never read back)."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        manifest = self._load_manifest(table) or {"current": -1, "snapshots": []}
        snap_id = manifest["current"] + 1
        data_dir = f"snap-{snap_id:06d}"
        df.write.mode("overwrite").partitionBy("_bucket").parquet(
            os.path.join(tdir, data_dir)
        )
        buckets: dict[str, str] = {}
        base = None
        if manifest["snapshots"]:
            if base_round is None:
                base = manifest["snapshots"][-1]
            else:
                prior = [
                    e
                    for e in manifest["snapshots"]
                    if e["round"] is not None and e["round"] <= base_round
                ]
                base = prior[-1] if prior else None
        if base is not None and base.get("buckets"):
            buckets = dict(base["buckets"])
        for k in touched:
            bdir = os.path.join(tdir, data_dir, f"_bucket={k}")
            if os.path.isdir(bdir):  # a touched bucket may merge to empty
                buckets[str(k)] = f"{data_dir}/_bucket={k}"
            else:
                buckets.pop(str(k), None)
        entry = {
            "id": snap_id,
            "round": round_no,
            "committed_at": time.time(),
            "dirs": [],
            "buckets": buckets,
            "schema": df.drop("_bucket").schema.json(),
            "lineage": lineage or [],
            "counters": counters or {},
        }
        manifest["snapshots"].append(entry)
        manifest["current"] = snap_id
        fd, tmp = tempfile.mkstemp(dir=tdir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))
        return snap_id

    def is_bucketed_as_of(self, table: str, round_no: int) -> bool:
        candidates = [
            e
            for e in self.history(table)
            if e["round"] is not None and e["round"] <= round_no
        ]
        return bool(candidates and candidates[-1].get("buckets"))

    def bucket_map_as_of(self, table: str, round_no: int) -> dict[str, str]:
        candidates = [
            e
            for e in self.history(table)
            if e["round"] is not None and e["round"] <= round_no
        ]
        return dict(candidates[-1].get("buckets") or {}) if candidates else {}

    def _entry(self, table: str, snapshot_id: int | None = None) -> dict:
        m = self._load_manifest(table)
        if m is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        snap_id = m["current"] if snapshot_id is None else snapshot_id
        for e in m["snapshots"]:
            if e["id"] == snap_id:
                return e
        raise FileNotFoundError(f"table {table} has no snapshot {snapshot_id}")

    def _empty_from_entry(self, e: dict) -> DataFrame:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(e["schema"]))
        return self.spark.createDataFrame([], schema)

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        e = self._entry(table, snapshot_id)
        tdir = os.path.join(self.root, table)
        if "buckets" in e:
            dirs = list(e["buckets"].values())
            if not dirs:  # bucketed snapshot that merged to empty
                return self._empty_from_entry(e)
        else:
            dirs = e["dirs"]
        return self.spark.read.parquet(*[os.path.join(tdir, d) for d in dirs])

    def read_buckets(
        self, table: str, round_no: int, buckets: list[int]
    ) -> DataFrame | None:
        """O(touched) bucket read: only the requested buckets' data
        dirs are scanned (the file-pruning half of the bucketed MERGE
        — filtering a full-table read on a recomputed bucket column
        would scan every file). None if no snapshot ≤ round_no."""
        candidates = [
            e
            for e in self.history(table)
            if e["round"] is not None and e["round"] <= round_no
        ]
        if not candidates:
            return None
        e = candidates[-1]
        bmap = e.get("buckets") or {}
        dirs = [bmap[str(b)] for b in buckets if str(b) in bmap]
        if not dirs:
            return self._empty_from_entry(e)
        tdir = os.path.join(self.root, table)
        return self.spark.read.parquet(*[os.path.join(tdir, d) for d in dirs])

    def read_as_of_round(self, table: str, round_no: int) -> DataFrame | None:
        """Latest snapshot committed at or before ``round_no`` — the
        resume read: snapshots from a crashed, never-committed round are
        skipped (their data dirs are simply never referenced again)."""
        candidates = [
            e
            for e in self.history(table)
            if e["round"] is not None and e["round"] <= round_no
        ]
        if not candidates:
            return None
        return self.read(table, candidates[-1]["id"])

    def read_or_empty(self, table: str, schema: str) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], schema)

    # -- metadata -----------------------------------------------------------
    def history(self, table: str) -> list[dict]:
        m = self._load_manifest(table)
        return [] if m is None else m["snapshots"]

    def counters(self, table: str) -> dict:
        m = self._load_manifest(table)
        if m is None or not m["snapshots"]:
            return {}
        return m["snapshots"][-1]["counters"]

    def last_committed_round(self, table: str) -> int:
        """Highest round recorded in the table's history (−1 if none) —
        the resume point after a crash."""
        rounds = [s["round"] for s in self.history(table) if s["round"] is not None]
        return max(rounds) if rounds else -1

    def expire_snapshots(self, table: str, keep: int = 2) -> None:
        """GC old snapshot data dirs (keeps manifests' history entries)."""
        m = self._load_manifest(table)
        if m is None:
            return
        live: set[str] = set()
        for s in m["snapshots"][-keep:]:
            live.update(s["dirs"])
            # a snap dir stays live while ANY of its buckets is referenced
            live.update(p.split("/", 1)[0] for p in s.get("buckets", {}).values())
        tdir = os.path.join(self.root, table)
        for name in os.listdir(tdir):
            if name.startswith("snap-") and name not in live:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)
