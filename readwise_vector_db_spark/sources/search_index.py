"""Warm-path search layout: the offline "index build" for semantic search.

The reference serves its 500 ms-class P95 from a warm process with a
prebuilt pgvector HNSW index (reference ``db/supabase_ops.py`` + the
migration adding the index) — the per-request work is probe + shape, not
parse + join + normalize.  The Spark analogue of "build the index" is a
data layout written once and exploited by every query:

- ``vectors``: the narrow (id, embedding, emb_norm) table, bucketed and
  sorted by id.  ``emb_norm`` is precomputed, so a query does exactly
  one fold per row; scoring scans only these three columns.
- ``metadata``: the fat columns, bucketed by id with the same bucket
  count — the winners join back exchange-free, and a filtered search's
  id semi-join into vectors is co-located (zero shuffle; proven
  Exchange-free in tests/test_bucketing.py for this layout).

``warm_tables`` is idempotent and cross-process: the first call builds
the layout under ``<repo>/.warm_index/<sf-tag>`` and registers catalog
tables; later calls (any session) re-register the existing files after
checking a source fingerprint (size+mtime of the fixture parquets), so a
regenerated fixture never serves a stale index.
"""

from __future__ import annotations


import os
import re
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.sources.tables import corpus_split

N_BUCKETS = 8

_REPO_ROOT = Path(__file__).resolve().parents[2]
_INDEX_ROOT = _REPO_ROOT / ".warm_index"

_VEC_SCHEMA = "id STRING, embedding ARRAY<FLOAT>, emb_norm DOUBLE"
_META_SCHEMA = (
    "id STRING, text STRING, source_type STRING, lang STRING, "
    "n_chars BIGINT, tags ARRAY<STRING>"
)


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9]", "_", os.path.basename(sf_dir.rstrip("/")))


def _source_fingerprint(sf_dir: str) -> str:
    parts = []
    for name in ("documents", "embeddings"):
        st = os.stat(f"{sf_dir}/{name}.parquet")
        parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


def _register_external(
    spark: SparkSession, table: str, schema: str, path: Path
) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema}) USING PARQUET "
        f"CLUSTERED BY (id) SORTED BY (id) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )


def build_search_index(spark: SparkSession, sf_dir: str, force: bool = False) -> bool:
    """Write the bucketed (vectors, metadata) layout for ``sf_dir`` —
    the offline index build.  Safe to call repeatedly; rebuilds only when
    missing, stale (source parquet changed), or ``force``.  Returns True
    when a (re)build happened."""
    tag = _tag(sf_dir)
    base = _INDEX_ROOT / tag
    marker = base / "FINGERPRINT"
    fp = _source_fingerprint(sf_dir)
    if not force and marker.exists() and marker.read_text() == fp:
        return False
    if base.exists():
        shutil.rmtree(base)
    base.mkdir(parents=True, exist_ok=True)
    meta, vecs = corpus_split(spark, sf_dir)
    # write through temp catalog names; the durable artifact is the files
    for df, sub, schema in (
        (vecs, "vectors", _VEC_SCHEMA),
        (meta, "metadata", _META_SCHEMA),
    ):
        path = base / sub
        tmp_table = f"rw_warm_build_{tag}_{sub}"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        (
            df.repartition(N_BUCKETS, "id")
            .write.bucketBy(N_BUCKETS, "id")
            .sortBy("id")
            .option("path", str(path))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tmp_table)
        )
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    marker.write_text(fp)
    return True


# (vec_dir, qid, source-fingerprint) → embedding.  Driver-process-local
# memo (a forked worker would start empty, never stale — lookups happen
# only on the driver).  MISSES ARE NOT CACHED: a lookup racing a layout
# rebuild can legitimately see a partial/empty vectors dir, and a cached
# None would silently force the Spark-fetch fallback for that id until
# the source fixture's mtime changed.  A found vector is safe to cache —
# for a fixed source fingerprint the value can't change (force rebuilds
# rewrite the same rows).
_VEC_CACHE: dict[tuple[str, str, str], tuple[float, ...]] = {}
_VEC_CACHE_MAX = 4096


def _stored_vec_cached(vec_dir: str, qid: str, fp: str) -> tuple[float, ...] | None:
    key = (vec_dir, qid, fp)
    hit = _VEC_CACHE.get(key)
    if hit is not None:
        return hit
    import duckdb

    row = (
        duckdb.connect()
        .execute(
            f"SELECT embedding FROM read_parquet('{vec_dir}/*.parquet') WHERE id = ?",
            [qid],
        )
        .fetchone()
    )
    if row is None:
        return None
    if len(_VEC_CACHE) >= _VEC_CACHE_MAX:
        _VEC_CACHE.clear()
    vec = tuple(float(x) for x in row[0])
    _VEC_CACHE[key] = vec
    return vec


def stored_query_vector(sf_dir: str, qid: str) -> list[float] | None:
    """Fetch one stored embedding from the warm layout WITHOUT a Spark job.

    A serving path resolves the query vector from index metadata, not a
    distributed scan — this reads the (local, narrow) layout files
    driver-side and memoizes per (layout, id, source fingerprint), as a
    server's query-vector lookup layer would.  At cluster scale the same
    read is a bucket-pruned single-file fetch (id → Murmur3 bucket);
    here all buckets together are a few MB, so pruning is skipped.
    Returns None if the layout (or the id) is missing — callers fall
    back to a Spark fetch.
    """
    vec_dir = _INDEX_ROOT / _tag(sf_dir) / "vectors"
    if not vec_dir.exists():
        return None
    vec = _stored_vec_cached(str(vec_dir), qid, _source_fingerprint(sf_dir))
    return list(vec) if vec is not None else None


# (applicationId, sf-tag, source-fingerprint, cache flag) → handles.
# A serving process resolves its index handles once, not per request:
# rebuilding the DataFrames per call costs catalog round-trips + plan
# re-analysis that dominated the measured warm latency (~340 ms of a
# ~380 ms request at sf0.1).  The fingerprint keys staleness — a
# regenerated fixture gets fresh handles — and the applicationId keys
# the session.
_HANDLES: dict[tuple[str, str, str, bool], tuple[DataFrame, DataFrame]] = {}


def warm_tables(
    spark: SparkSession, sf_dir: str, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(metadata, vectors) DataFrames over the warm layout, building it on
    first use.  Reads come from registered bucketed catalog tables so
    joins on id require no Exchange.

    ``cache=True`` pins both tables in Spark's storage cache — the
    analogue of the reference's memory-resident HNSW index (its serving
    latency also assumes the index is in RAM, not read per query).
    MEMORY_AND_DISK default storage: an index bigger than executor
    memory spills instead of failing, and a `clearCache()` (or executor
    loss) just re-materializes lazily from the parquet layout."""
    fp = _source_fingerprint(sf_dir)
    key = (spark.sparkContext.applicationId, _tag(sf_dir), fp, cache)
    hit = _HANDLES.get(key)
    if hit is not None:
        return hit
    # fingerprint miss: evict superseded generations for this (app, tag)
    # — without this a long-lived serving session that regenerates its
    # fixture leaks storage memory (the old entry's cached DataFrames
    # stay pinned over dropped/re-created catalog tables forever)
    for stale in [
        k for k in _HANDLES if k[0] == key[0] and k[1] == key[1] and k[2] != fp
    ]:
        old_meta, old_vec = _HANDLES.pop(stale)
        if stale[3]:
            try:
                old_meta.unpersist()
                old_vec.unpersist()
            except Exception:
                pass
    tag = _tag(sf_dir)
    base = _INDEX_ROOT / tag
    vname, mname = f"rw_warm_vectors_{tag}", f"rw_warm_meta_{tag}"
    rebuilt = build_search_index(spark, sf_dir)
    cat = spark.catalog
    if rebuilt or not cat.tableExists(vname) or not cat.tableExists(mname):
        _register_external(spark, vname, _VEC_SCHEMA, base / "vectors")
        _register_external(spark, mname, _META_SCHEMA, base / "metadata")
    meta_df, vec_df = spark.table(mname), spark.table(vname)
    if cache:
        meta_df, vec_df = meta_df.cache(), vec_df.cache()
    _HANDLES[key] = (meta_df, vec_df)
    return meta_df, vec_df
