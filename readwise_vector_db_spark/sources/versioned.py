"""Versioned parquet table: snapshot-isolated reads, atomic commits.

The plain-parquet upsert (operators/upsert.py) must materialize the
merged result on the driver before overwriting, because a lazy plan
cannot read the directory it is replacing.  That collect() is fine for
control tables and fatal at 100 TB.  The real fix is the one Delta Lake
/ Iceberg use: **never overwrite — write a new snapshot directory and
flip a manifest pointer**.

Layout:

    root/_LATEST            text file holding the current version number
    root/v=00000001/ ...    immutable snapshot directories

- ``read`` resolves ``_LATEST`` once; the returned DataFrame scans an
  immutable directory, so concurrent commits never disturb running
  queries (snapshot isolation), and old versions remain time-travelable
  until ``vacuum``.
- ``commit`` writes the next snapshot dir, then atomically renames a
  tmp manifest over ``_LATEST`` (POSIX rename; on an object store this
  pointer swap is the job of a commit/catalog service — same protocol).
- ``merge`` = read-latest → merge_upsert plan → commit: source and sink
  are DIFFERENT directories, so the merge runs as a pure distributed
  plan — no driver materialization, any table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from readwise_vector_db_spark.operators.upsert import merge_upsert

_MANIFEST = "_LATEST"
_SEGMENTS = "_SEGMENTS"


class VersionedTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest ------------------------------------------------------------

    def latest_version(self) -> int | None:
        try:
            with open(os.path.join(self.root, _MANIFEST)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version:08d}")

    def _flip_manifest(self, version: int) -> None:
        tmp = os.path.join(self.root, f"{_MANIFEST}.tmp.{version}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.root, _MANIFEST))  # atomic pointer swap

    def _prepare_version(self, version: int) -> str:
        """Reserve the directory for ``version``, clearing debris from a
        crashed writer.  A failure between the segment write and the
        pointer flip leaves a stray ``v=N+1`` directory that is
        unreferenced BY CONSTRUCTION (the manifest never advanced), but
        parquet's ``errorifexists`` would otherwise refuse v=N+1 forever
        — every retry (including foreachBatch re-delivery of the same
        micro-batch) would wedge.  Single-writer protocol, same as Delta
        without a commit service: anything at or above latest+1 is a
        dead writer's garbage, so removing it is safe."""
        import shutil

        d = self._version_dir(version)
        if os.path.exists(d):
            shutil.rmtree(d)
        seg = os.path.join(self.root, f"{_SEGMENTS}_{version:08d}")
        for stray in (seg, seg + ".tmp"):
            if os.path.exists(stray):
                os.remove(stray)
        return d

    # --- table ops -----------------------------------------------------------

    def _segments(self, version: int) -> list[str]:
        """Directory names composing ``version``: a plain commit is one
        self-named segment; an append commit lists shared segments."""
        try:
            with open(os.path.join(self.root, f"{_SEGMENTS}_{version:08d}")) as f:
                return json.load(f)
        except FileNotFoundError:
            return [f"v={version:08d}"]

    def exists(self) -> bool:
        return self.latest_version() is not None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to an explicit ``version``."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return spark.read.parquet(
            *[os.path.join(self.root, s) for s in self._segments(v)]
        )

    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next immutable snapshot and flip the pointer."""
        v = (self.latest_version() or 0) + 1
        df.write.mode("errorifexists").parquet(self._prepare_version(v))
        self._flip_manifest(v)
        return v

    def commit_append(self, df: DataFrame) -> int:
        """Append-only commit: write ONLY ``df`` as a new immutable
        segment and publish snapshot N+1 = snapshot N's segments + the
        new one (a segment-sharing manifest — how Delta/Iceberg make
        appends O(increment), not O(table)).  The segment list lands
        before the ``_LATEST`` pointer flips, so a crash in between
        leaves the old snapshot intact and the stray segment unreferenced.
        Incremental ingest (jobs/incremental_dedup.py) commits every
        batch this way; ``compact`` later folds segments into one."""
        prev = self.latest_version()
        v = (prev or 0) + 1
        df.write.mode("errorifexists").parquet(self._prepare_version(v))
        segs = (self._segments(prev) if prev is not None else []) + [f"v={v:08d}"]
        tmp = os.path.join(self.root, f"{_SEGMENTS}_{v:08d}.tmp")
        with open(tmp, "w") as f:
            json.dump(segs, f)
        os.replace(tmp, os.path.join(self.root, f"{_SEGMENTS}_{v:08d}"))
        self._flip_manifest(v)
        return v

    def merge(self, spark: SparkSession, updates: DataFrame, key: str) -> int:
        """MERGE-style upsert as a pure distributed plan (no collect):
        the plan reads snapshot N and writes snapshot N+1."""
        if not self.exists():
            return self.commit(updates)
        merged = merge_upsert(self.read(spark), updates, key)
        return self.commit(merged)

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current snapshot into ``target_files`` files.

        Merge-heavy tables accumulate small files (every micro-batch
        commit writes its own); compaction is just another commit — read
        latest, coalesce, write N+1 — so readers keep snapshot isolation
        throughout and a crashed compaction leaves the pointer untouched.
        """
        df = self.read(spark)
        return self.commit(df.coalesce(target_files))

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` snapshots.  Returns removed
        versions.  Readers of removed versions fail afterwards — at scale
        this runs with a retention horizon, exactly like Delta VACUUM."""
        import shutil

        latest = self.latest_version()
        if latest is None:
            return []
        # segment dirs referenced by any KEPT version must survive even
        # if their own version number is old — append commits share
        # segments across snapshots
        live: set[str] = set()
        for v in range(max(1, latest - keep + 1), latest + 1):
            live.update(self._segments(v))
        removed = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("v=") or name in live:
                continue
            v = int(name.split("=")[1])
            if v <= latest - keep:
                shutil.rmtree(os.path.join(self.root, name))
                removed.append(v)
                seg_manifest = os.path.join(self.root, f"{_SEGMENTS}_{v:08d}")
                if os.path.exists(seg_manifest):
                    os.remove(seg_manifest)
        return removed
