"""Search operator semantics (reference core/search.py + db/supabase_ops.py)."""

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.search import (
    SearchParams,
    apply_filters,
    query_vector_for_id,
    semantic_search,
)
from readwise_vector_db_spark.sources.tables import highlights
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def hl(spark):
    df = highlights(spark, SF_SMOKE)
    df.cache().count()
    return df


def test_k_clamped_to_100(hl, spark):
    qv = query_vector_for_id(hl, "0")
    out = semantic_search(hl, qv, SearchParams(k=5000))
    assert out.count() == 100  # api/routes.py:100 clamps 1..100


def test_k_clamped_min_1(hl):
    assert SearchParams(k=0).clamped_k() == 1
    assert SearchParams(k=-5).clamped_k() == 1


def test_self_is_nearest(hl):
    qv = query_vector_for_id(hl, "42")
    top = semantic_search(hl, qv, SearchParams(k=1)).first()
    assert top["id"] == "42"
    assert top["score"] == pytest.approx(0.0, abs=1e-6)


def test_filters_applied_before_limit(hl):
    """The reference's Supabase path filters AFTER the limit (a bug,
    core/search.py:91-114); we assert correct pre-limit semantics."""
    qv = query_vector_for_id(hl, "0")
    unfiltered = semantic_search(hl, qv, SearchParams(k=5))
    langs = {r["lang"] for r in unfiltered.collect()}
    assert len(langs) > 1  # top-5 spans languages...
    filtered = semantic_search(hl, qv, SearchParams(k=5, lang="en"))
    rows = filtered.collect()
    assert len(rows) == 5  # ...but the filtered query still fills k rows
    assert all(r["lang"] == "en" for r in rows)


def test_results_sorted_ascending_with_id_tiebreak(hl):
    qv = query_vector_for_id(hl, "7")
    rows = semantic_search(hl, qv, SearchParams(k=20)).collect()
    keys = [(r["score"], r["id"]) for r in rows]
    assert keys == sorted(keys)


def test_null_embeddings_excluded(spark, hl):
    with_null = hl.unionByName(
        hl.limit(1).withColumn("embedding", F.lit(None).cast("array<float>"))
        .withColumn("emb_norm", F.lit(None).cast("double"))
        .withColumn("id", F.lit("null-emb"))
    )
    qv = query_vector_for_id(hl, "0")
    out = semantic_search(with_null, qv, SearchParams(k=100))
    assert not any(r["id"] == "null-emb" for r in out.collect())


def test_tags_overlap_any_semantics(hl):
    qv = query_vector_for_id(hl, "0")
    rows = semantic_search(
        hl, qv, SearchParams(k=50, tags=["the", "window"])
    ).collect()
    assert rows
    assert all({"the", "window"} & set(r["tags"]) for r in rows)


def test_search_over_fp16_storage(spark):
    """The fp16 storage codec integrates with search: pack → unpack →
    top-k returns the same neighbors as the float path (scores shift by
    at most fp16 epsilon, which 64-dim cosine keeps well under 1e-3)."""
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.functions.vector import (
        cosine_distance,
        pack_fp16,
        unpack_fp16,
    )
    from readwise_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    embs = load_table(spark, SF_SMOKE, "embeddings")
    stored = embs.select("vec_id", pack_fp16()(F.col("embedding")).alias("b"))
    restored = stored.select("vec_id", unpack_fp16()(F.col("b")).alias("embedding"))
    qv = [float(x) for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]]
    qlit = F.array(*[F.lit(x) for x in qv]).cast("array<double>")

    def topk(df):
        return (
            df.select("vec_id", cosine_distance(F.col("embedding"), qlit).alias("d"))
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(10)
            .collect()
        )

    ids_fp16 = [r["vec_id"] for r in topk(restored)]
    exact = topk(embs)
    ids_f32 = [r["vec_id"] for r in exact]
    assert ids_fp16 == ids_f32
    d_fp16 = {r["vec_id"]: r["d"] for r in topk(restored)}
    for r in exact:
        assert abs(d_fp16[r["vec_id"]] - r["d"]) < 1e-3


def test_warm_served_path_matches_cold(spark):
    """The warm layout + served plan must return exactly what the cold
    vector-first plan returns for the same stored query vector."""
    from readwise_vector_db_spark.operators.search import (
        semantic_search_served,
        semantic_search_stored,
    )
    from readwise_vector_db_spark.sources.search_index import (
        stored_query_vector,
        warm_tables,
    )
    from readwise_vector_db_spark.sources.tables import corpus_split

    params = SearchParams(k=10, lang="en")
    meta_c, vecs_c = corpus_split(spark, SF_SMOKE)
    cold = semantic_search_stored(meta_c, vecs_c, "0", params).collect()

    meta_w, vecs_w = warm_tables(spark, SF_SMOKE)
    qv = stored_query_vector(SF_SMOKE, "0")
    assert qv is not None and len(qv) == 64
    warm = semantic_search_served(meta_w, vecs_w, qv, params).collect()

    assert [r.asDict() for r in warm] == [r.asDict() for r in cold]


def test_served_empty_filter_returns_empty(spark):
    from readwise_vector_db_spark.operators.search import semantic_search_served
    from readwise_vector_db_spark.sources.search_index import (
        stored_query_vector,
        warm_tables,
    )

    meta, vecs = warm_tables(spark, SF_SMOKE)
    qv = stored_query_vector(SF_SMOKE, "0")
    out = semantic_search_served(
        meta, vecs, qv, SearchParams(k=10, source_type="no-such-source")
    )
    assert out.count() == 0
    assert "score" in out.columns


def test_warm_handles_memoized_and_fingerprint_invalidated(spark, tmp_path):
    """warm_tables returns the SAME handle objects per (session, layout,
    source fingerprint) — and a changed source fingerprint (regenerated
    fixture) must miss the memo and rebuild, never serve stale handles."""
    import shutil

    from readwise_vector_db_spark.sources import search_index as si

    # private fixture copy so touching mtimes can't interfere with other tests
    src = str(tmp_path / "sf_copy")
    shutil.copytree(SF_SMOKE, src)

    a = si.warm_tables(spark, src)
    b = si.warm_tables(spark, src)
    assert a[0] is b[0] and a[1] is b[1]

    # simulate fixture regeneration: bump a source file's mtime
    import os
    import time as _time

    doc = f"{src}/documents.parquet"
    os.utime(doc, (os.path.getatime(doc), os.path.getmtime(doc) + 5))
    c = si.warm_tables(spark, src)
    assert c[0] is not a[0]
    # the rebuilt handles still serve correct data
    assert c[1].count() == a[1].count() > 0
    # the superseded generation is EVICTED, not leaked: exactly one
    # handle entry remains for this (app, tag), and the old cached
    # DataFrames were unpersisted (storage memory released)
    app = spark.sparkContext.applicationId
    tag = si._tag(src)
    live = [k for k in si._HANDLES if k[0] == app and k[1] == tag]
    assert len(live) == 1
    # (storageLevel can't distinguish old from new here: both handles
    # resolve the same catalog table name, and Spark's cache registry is
    # plan-keyed — the eviction itself is what the count above pins.)


def test_vector_literal_bitwise_matches_per_element_lits(spark):
    """The expr-string vector literal must be bit-identical to the
    per-element F.lit construction for adversarial doubles (subnormals,
    huge/tiny magnitudes, negative zero, long mantissas) — repr() must
    round-trip every IEEE-754 double through the SQL parser."""
    import math
    import struct

    from pyspark.sql import functions as F

    from readwise_vector_db_spark.operators.search import vector_literal

    vals = [
        0.0, -0.0, 1.0, -1.0, math.pi, -math.e, 1e-308, 5e-324, 1.7976931348623157e308,
        0.1, 1 / 3, -2.2250738585072014e-308, 123456789.123456789, 6.02e23,
    ]
    df = spark.range(1)
    got = df.select(vector_literal(vals).alias("v")).first()["v"]
    ref = df.select(
        F.array(*[F.lit(float(x)) for x in vals]).cast("array<double>").alias("v")
    ).first()["v"]
    assert [struct.pack("d", x) for x in got] == [struct.pack("d", x) for x in ref]


def test_served_search_survives_zero_norm_vectors(spark):
    """A zero-norm corpus vector has no direction: its cosine score is
    NULL, it may enter the winner list (Spark sorts NULLs first under
    asc), and the serving path must emit it with a NULL score — exactly
    what the per-element F.lit(None) construction did — rather than
    crash building the literal score map."""
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.operators.search import (
        SearchParams,
        semantic_search_served,
    )

    vecs = spark.createDataFrame(
        [("a", [1.0, 0.0], 1.0), ("z", [0.0, 0.0], 0.0), ("b", [0.0, 1.0], 1.0)],
        "id string, embedding array<float>, emb_norm double",
    )
    meta = spark.createDataFrame(
        [("a", "ta"), ("z", "tz"), ("b", "tb")], "id string, text string"
    )
    rows = semantic_search_served(meta, vecs, [1.0, 0.0], SearchParams(k=3)).collect()
    by_id = {r["id"]: r["score"] for r in rows}
    assert by_id["z"] is None
    assert by_id["a"] == 0.0 and abs(by_id["b"] - 1.0) < 1e-9
