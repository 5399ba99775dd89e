"""Iceberg-shaped warehouse shim: atomic snapshot commits + time travel.

The north rule asks for Iceberg-checkpointed superstep state. The sandbox has
no Iceberg runtime jar (and no network), so this module provides the two
Iceberg semantics the engine actually depends on — atomic snapshot commit and
snapshot time-travel — over a plain parquet layout with a JSON manifest per
table, while keeping an Iceberg-shaped API so a real catalog can drop in:

    wh = Warehouse(root)                        # ~ spark.sql.catalog.local
    wh.commit(spark, "pr_state", df, meta)      # ~ df.writeTo(t).createOrReplace()
    wh.read(spark, "pr_state")                  # latest snapshot
    wh.read(spark, "pr_state", snapshot_id=3)   # ~ VERSION AS OF
    wh.snapshots("pr_state")                    # ~ table.snapshots metadata

Atomicity: data is written to an immutable snapshot directory first; the
manifest (single JSON file) is replaced via os.replace (atomic on POSIX).
A reader never observes a half-written snapshot: until the manifest points at
it, the directory is invisible.

If a real Iceberg catalog is configured on the session
(spark.sql.catalog.<name> present), `use_iceberg()` reports True and callers
may use native `writeTo` paths instead.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Any


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    path: str
    committed_at_ms: int
    meta: dict[str, Any]


class Warehouse:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.manifest.json")

    def _load_manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def snapshots(self, table: str) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._load_manifest(table)]

    def latest(self, table: str) -> Snapshot | None:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    # -- commit / read ---------------------------------------------------------

    def commit(self, spark, table: str, df, meta: dict[str, Any] | None = None) -> Snapshot:
        """Write df as a new immutable snapshot of `table`, atomically."""
        snaps = self._load_manifest(table)
        sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 0
        parent = snaps[-1]["snapshot_id"] if snaps else None
        path = os.path.join(self.root, table, f"snapshot-{sid:06d}")
        df.write.mode("overwrite").parquet(path)
        snap = Snapshot(
            snapshot_id=sid,
            parent_id=parent,
            path=path,
            committed_at_ms=int(time.time() * 1000),
            meta=meta or {},
        )
        snaps.append(asdict(snap))
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point
        return snap

    def read(self, spark, table: str, snapshot_id: int | None = None):
        snaps = self._load_manifest(table)
        if not snaps:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        if snapshot_id is None:
            s = snaps[-1]
        else:
            matching = [x for x in snaps if x["snapshot_id"] == snapshot_id]
            if not matching:
                raise KeyError(f"{table}: no snapshot {snapshot_id}")
            s = matching[0]
        return spark.read.parquet(s["path"])

    def drop(self, table: str) -> None:
        import shutil

        p = self._manifest_path(table)
        if os.path.exists(p):
            os.remove(p)
        d = os.path.join(self.root, table)
        if os.path.isdir(d):
            shutil.rmtree(d)


def use_iceberg(spark) -> bool:
    """True if a real Iceberg catalog is configured on this session."""
    conf = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower() for k, v in conf)
