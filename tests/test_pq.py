"""Product quantization: codebooks, encoding, ADC recall, exact-on-
reconstruction property (operators/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import pq
from readwise_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings").persist()


@pytest.fixture(scope="module")
def books(spark, embs):
    return pq.train_pq_codebooks(embs, m=8, k=32, sample_rows=5000)


def _exact_topk(spark, embs, q, k):
    from readwise_vector_db_spark.functions.vector import cosine_similarity

    qn = np.asarray(q, dtype=np.float64)
    qn = (qn / np.linalg.norm(qn)).tolist()
    return [
        r["vec_id"]
        for r in embs.select(
            "vec_id",
            cosine_similarity(
                F.col("embedding").cast("array<double>"),
                F.lit(qn).cast("array<double>"),
            ).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(k)
        .collect()
    ]


def test_codebook_shapes_and_validation(spark, embs, books):
    assert len(books) == 8
    d = len(embs.first()["embedding"])
    assert all(b.shape == (32, d // 8) for b in books)
    with pytest.raises(ValueError, match="divisible"):
        pq.train_pq_codebooks(embs, m=7)


def test_encode_is_total_and_deterministic(spark, embs, books):
    codes = pq.pq_encode(embs, books)
    n = embs.filter(F.col("embedding").isNotNull()).count()
    rows = codes.collect()
    assert len(rows) == n
    assert all(len(r["pq_code"]) == 8 for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r["pq_code"])
    again = {r["vec_id"]: r["pq_code"] for r in pq.pq_encode(embs, books).collect()}
    assert {r["vec_id"]: r["pq_code"] for r in rows} == again


def test_adc_matches_reconstruction_inner_product(spark, books):
    """The ADC score must equal ``dot(reconstruction(codes), q_norm)``
    exactly — recomputed here from the codes the encoder actually
    produced, pinning the LUT indexing and summation independent of
    which centroids got picked."""
    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(len(books) * books[0].shape[1])])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: r["pq_code"] for r in pq.pq_encode(df, books).collect()}
    q = np.asarray(rows[7][1], dtype=np.float32)
    qn = q / np.linalg.norm(q)
    got = {
        r["vec_id"]: r["score"]
        for r in pq.pq_search(
            pq.pq_encode(df, books), list(q), books, k=40
        ).collect()
    }
    for i, code in codes.items():
        recon = np.concatenate([books[j][code[j]] for j in range(len(books))])
        want = float(np.dot(recon, qn))
        assert abs(got[i] - want) < 1e-4, (i, got[i], want)


def test_save_load_roundtrip(spark, embs, books, tmp_path):
    codes = pq.pq_encode(embs, books)
    pq.save_pq_index(codes, books, str(tmp_path / "pqidx"))
    codes2, books2 = pq.load_pq_index(spark, str(tmp_path / "pqidx"))
    assert len(books2) == len(books)
    for a, b in zip(books, books2):
        assert np.allclose(a, b)
    want = {r["vec_id"]: r["pq_code"] for r in codes.collect()}
    got = {r["vec_id"]: r["pq_code"] for r in codes2.collect()}
    assert want == got
    # a probe over the loaded index returns the same rows as the built one
    q = list(embs.orderBy("vec_id").first()["embedding"])
    a = pq.pq_search(codes, q, books, k=5).collect()
    b = pq.pq_search(codes2, q, books2, k=5).collect()
    assert [(r["vec_id"], r["score"]) for r in a] == [
        (r["vec_id"], r["score"]) for r in b
    ]


def test_encode_rejects_wrong_dim(spark, books):
    bad = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 63)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="dim 63.*expect"):
        pq.pq_encode(bad, books).collect()
    cents = [(0, [0.0] * 64)]
    with pytest.raises(Exception, match="dim 63.*expects"):
        pq.ivfpq_encode(bad, cents, books).collect()


def test_ivfpq_encode_matches_components(spark, embs, books):
    """One-pass ivfpq_encode must agree with the two components it fuses:
    assign_cells(blas) for the cell, pq_encode for the code."""
    from readwise_vector_db_spark.operators import similarity as sim

    _, centroids = sim.build_ivf_index(embs, n_clusters=8)
    fused = {
        r["vec_id"]: (r["cluster"], r["pq_code"])
        for r in pq.ivfpq_encode(embs, centroids, books).collect()
    }
    cells = {
        r["vec_id"]: r["cluster"]
        for r in sim.assign_cells(
            embs.filter(F.col("embedding").isNotNull()), centroids, method="blas"
        ).collect()
    }
    codes = {r["vec_id"]: r["pq_code"] for r in pq.pq_encode(embs, books).collect()}
    assert fused == {i: (cells[i], codes[i]) for i in codes}


def test_ivfpq_probe_prunes_and_matches(spark, embs, books, tmp_path):
    """A probe over the persisted layout must (a) push the cluster
    IN-filter into partition pruning, (b) return the same rows as the
    in-memory composition, and (c) retrieve a planted duplicate pair at
    true-cosine 1.0 through rescore."""
    from readwise_vector_db_spark.operators import similarity as sim

    q0 = embs.orderBy("vec_id").first()
    plant = spark.createDataFrame(
        [(int(q0["vec_id"]) + 1_000_000, list(q0["embedding"]))],
        "vec_id long, embedding array<float>",
    )
    corpus = embs.select("vec_id", "embedding").unionByName(plant)
    _, centroids = sim.build_ivf_index(corpus, n_clusters=8)
    codes = pq.ivfpq_encode(corpus, centroids, books)
    path = str(tmp_path / "ivfpq")
    pq.save_ivfpq_index(codes, centroids, books, path)
    codes2, cents2, books2 = pq.load_ivfpq_index(spark, path)
    assert cents2 == [(c, [float(x) for x in v]) for c, v in sorted(centroids)]

    qv = [float(x) for x in q0["embedding"]]
    mem = pq.ivfpq_search(codes, centroids, books, qv, k=10, nprobe=3).collect()
    disk_df = pq.ivfpq_search(codes2, cents2, books2, qv, k=10, nprobe=3)
    disk = disk_df.collect()
    assert [(r["vec_id"], r["score"]) for r in mem] == [
        (r["vec_id"], r["score"]) for r in disk
    ]
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    rescored = pq.ivfpq_search(
        codes2, cents2, books2, qv, k=10, nprobe=3, rescore=corpus, rescore_factor=8
    ).collect()
    top = {r["vec_id"] for r in rescored if r["score"] == 1.0}
    assert top == {int(q0["vec_id"]), int(q0["vec_id"]) + 1_000_000}


def test_ivfpq_incremental_append(spark, embs, books, tmp_path):
    """Appending to a persisted IVF-PQ index must be O(increment): the
    increment becomes visible to probes (a planted duplicate returns at
    cosine 1.0), existing code files are never rewritten, and the codes
    match what the frozen model would assign."""
    import os

    from readwise_vector_db_spark.operators import similarity as sim

    base = embs.select("vec_id", "embedding")
    _, centroids = sim.build_ivf_index(base, n_clusters=8)
    path = str(tmp_path / "ivfpq_inc")
    pq.save_ivfpq_index(
        pq.ivfpq_encode(base, centroids, books), centroids, books, path
    )

    def code_files():
        out = {}
        for root, _, files in os.walk(f"{path}/codes"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = code_files()
    q0 = embs.orderBy("vec_id").first()
    plant_id = int(q0["vec_id"]) + 1_000_000
    plant = spark.createDataFrame(
        [(plant_id, list(q0["embedding"]))], "vec_id long, embedding array<float>"
    )
    assert pq.append_to_ivfpq_index(plant, path) == 1

    after = code_files()
    # append-only: every pre-existing file survives untouched
    assert set(before) <= set(after)
    assert all(after[p] == ts for p, ts in before.items())
    assert len(after) > len(before)

    codes, cents, bks = pq.load_ivfpq_index(spark, path)
    # the appended row carries the code/cell the frozen model assigns
    want = pq.ivfpq_encode(plant, centroids, books).first()
    got = codes.filter(F.col("vec_id") == plant_id).first()
    assert (got["cluster"], got["pq_code"]) == (want["cluster"], want["pq_code"])

    qv = [float(x) for x in q0["embedding"]]
    rescore = base.unionByName(plant)
    rows = pq.ivfpq_search(
        codes, cents, bks, qv, k=10, nprobe=3, rescore=rescore, rescore_factor=8
    ).collect()
    top = {r["vec_id"] for r in rows if r["score"] == 1.0}
    assert top == {int(q0["vec_id"]), plant_id}


def test_streaming_index_append(spark, embs, books, tmp_path):
    """Micro-batches of new vectors land in the persisted IVF-PQ index
    via the streaming face; a probe after drain retrieves a planted row
    that arrived only through the stream."""
    from readwise_vector_db_spark.jobs.index_maintenance import (
        run_streaming_index_append,
    )
    from readwise_vector_db_spark.operators import similarity as sim

    base = embs.select("vec_id", "embedding")
    _, centroids = sim.build_ivf_index(base, n_clusters=8)
    path = str(tmp_path / "ivfpq_stream")
    pq.save_ivfpq_index(
        pq.ivfpq_encode(base, centroids, books), centroids, books, path
    )

    q0 = embs.orderBy("vec_id").first()
    plant_id = int(q0["vec_id"]) + 1_000_000
    src = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(plant_id, list(q0["embedding"])), (plant_id + 1, [0.5] * 64)],
        "vec_id long, embedding array<float>",
    ).repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_streaming_index_append(spark, stream, path)
    q.awaitTermination(120)

    codes, cents, bks = pq.load_ivfpq_index(spark, path)
    assert codes.filter(F.col("vec_id") >= 1_000_000).count() == 2
    rescore = base.unionByName(
        spark.createDataFrame(
            [(plant_id, list(q0["embedding"]))], "vec_id long, embedding array<float>"
        )
    )
    rows = pq.ivfpq_search(
        codes, cents, bks, [float(x) for x in q0["embedding"]],
        k=10, nprobe=3, rescore=rescore, rescore_factor=8,
    ).collect()
    assert {r["vec_id"] for r in rows if r["score"] == 1.0} == {
        int(q0["vec_id"]), plant_id
    }


def test_pq_knn_join_recall_vs_exact(spark, embs, books):
    """Batch ADC join with exact rescore recalls nearly all of the exact
    join's neighbors, and the rows it recalls are bit-identical (same
    rounded cos_dist, ranks consistent)."""
    from readwise_vector_db_spark.operators import similarity as sim

    queries = embs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_dist"]
        for r in sim.knn_join(queries, embs, k=5, corpus_id="vec_id").collect()
    }
    codes = pq.pq_encode(embs, books).persist()
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_dist"]
        for r in pq.pq_knn_join(
            codes, queries, books, k=5, rescore=embs, rescore_factor=16
        ).collect()
    }
    codes.unpersist()
    hit = set(got) & set(exact)
    assert len(hit) / len(exact) >= 0.8, (len(hit), len(exact))
    assert all(got[p] == exact[p] for p in hit)


def test_pq_knn_join_adc_only_schema(spark, embs, books):
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = pq.pq_knn_join(pq.pq_encode(embs, books), queries, books, k=4).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rn"], r["score"]))
    for q, lst in per_q.items():
        lst.sort()
        assert [rn for rn, _ in lst] == [1, 2, 3, 4]
        scores = [s for _, s in lst]
        assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="at least one query"):
        pq.pq_knn_join(
            pq.pq_encode(embs, books), queries.filter("query_id < 0"), books
        )


def test_pq_string_ids_roundtrip(spark, embs, books):
    """String/UUID-style ids flow through encode → ADC join → rescore
    without a long cast (round-6 advice: the qid schema was hardcoded
    long).  Results must agree with the long-id run modulo the id
    mapping, on both the ADC-only and rescore paths."""
    sembs = embs.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("doc_key"), "embedding"
    )
    codes = pq.pq_encode(sembs, books, id_col="doc_key").persist()
    assert dict(codes.dtypes)["doc_key"] == "string"
    queries = sembs.filter(F.col("doc_key").isin("doc-0", "doc-1")).select(
        F.col("doc_key").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = pq.pq_knn_join(
        codes, queries, books, k=3, id_col="doc_key",
        rescore=sembs, vec_col="embedding", rescore_factor=8,
    ).collect()
    assert {r["query_id"] for r in rows} == {"doc-0", "doc-1"}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, lst in by_q.items():
        # self-match survives the exact rescore at rank 1, distance 0
        best = min(lst, key=lambda r: (r["cos_dist"], r["rn"]))
        assert best["neighbor_id"] == qid and best["cos_dist"] == 0.0
    # single-query path, rescore via IN filter, string ids end-to-end
    q0 = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    got = pq.pq_search(
        codes, q0, books, k=3, id_col="doc_key", rescore=sembs
    ).collect()
    assert got[0]["doc_key"] == "doc-0" and got[0]["score"] == 1.0
    codes.unpersist()


def test_pq_recall_and_rescore(spark, embs, books):
    q = list(embs.orderBy("vec_id").first()["embedding"])
    exact = _exact_topk(spark, embs, q, 10)
    codes = pq.pq_encode(embs, books).persist()
    adc = [r["vec_id"] for r in pq.pq_search(codes, q, books, k=10).collect()]
    recall = len(set(adc) & set(exact)) / 10
    assert recall >= 0.5, recall  # raw ADC on a 32-centroid toy model
    rescored = pq.pq_search(
        codes, q, books, k=10, rescore=embs, rescore_factor=8
    ).collect()
    r_ids = [r["vec_id"] for r in rescored]
    r_recall = len(set(r_ids) & set(exact)) / 10
    assert r_recall >= 0.8, r_recall
    # rescored scores are true cosines, descending
    scores = [r["score"] for r in rescored]
    assert scores == sorted(scores, reverse=True)
    codes.unpersist()


def test_ivfpq_rejects_empty_centroids(spark, embs, books):
    with pytest.raises(ValueError, match="non-empty centroid"):
        pq.ivfpq_encode(embs, [], books)
    with pytest.raises(ValueError, match="non-empty centroid"):
        pq.ivfpq_search(pq.pq_encode(embs, books), [], books, [0.0] * 64)


def test_append_staleness_guard(spark, books, tmp_path):
    """Round-7 retrain-cadence rule in code: save_ivfpq_index(base_vecs=)
    records the train-time coarse distortion, and append_to_ivfpq_index
    rejects an increment whose distortion ratio exceeds the limit (a
    drifted source), while a same-distribution increment sails through
    and max_distortion_ratio=None force-appends."""
    import numpy as np

    from readwise_vector_db_spark.operators import similarity as sim

    rng = np.random.default_rng(41)
    hubs = rng.standard_normal((4, 64)).astype(np.float64)
    base_rows = [
        (i, [float(x) for x in hubs[i % 4] + 0.05 * rng.standard_normal(64)])
        for i in range(200)
    ]
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<float>")
    _, centroids = sim.build_ivf_index(base, n_clusters=4)
    path = str(tmp_path / "ivfpq_stale")
    pq.save_ivfpq_index(
        pq.ivfpq_encode(base, centroids, books), centroids, books, path,
        base_vecs=base,
    )
    import os

    assert os.path.exists(f"{path}/distortion.json")

    # same-distribution increment: ratio ~1, accepted
    ok_rows = [
        (1_000 + i, [float(x) for x in hubs[i % 4] + 0.05 * rng.standard_normal(64)])
        for i in range(20)
    ]
    ok = spark.createDataFrame(ok_rows, "vec_id long, embedding array<float>")
    assert pq.append_to_ivfpq_index(ok, path) == 20

    # drifted source: new hubs nowhere near the frozen centroids
    drift_hub = rng.standard_normal(64)
    bad_rows = [
        (2_000 + i, [float(x) for x in drift_hub + 0.05 * rng.standard_normal(64)])
        for i in range(20)
    ]
    bad = spark.createDataFrame(bad_rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="stale"):
        pq.append_to_ivfpq_index(bad, path)
    # force-append is the caller's explicit decision
    assert pq.append_to_ivfpq_index(bad, path, max_distortion_ratio=None) == 20

    # coarse_distortion itself: tight blobs near centroids read smaller
    # than the drifted blob
    d_base = pq.coarse_distortion(base, centroids)
    d_bad = pq.coarse_distortion(bad, centroids)
    assert d_bad > 2 * d_base


def test_coarse_distortion_samples_uniformly_not_first_partitions(spark):
    """ADVICE r8 (medium): the old sample(1.0).limit(n) took the FIRST
    partitions — on a source-ordered corpus, one ingest epoch.  Corpus:
    low ids (the first range-partitions) sit ON the centroid, high ids
    sit far away.  A first-partitions slice reads ~0 distortion; the
    uniform sample must see both populations."""
    import numpy as np

    near = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(2_000)]
    far = [(2_000 + i, [0.0, 0.0, 1.0, 0.0]) for i in range(2_000)]
    df = spark.createDataFrame(
        near + far, "vec_id long, embedding array<float>"
    ).repartitionByRange(8, "vec_id")  # ordered partitions: near first
    centroids = [(0, [1.0, 0.0, 0.0, 0.0])]
    d = pq.coarse_distortion(df, centroids, sample_rows=400, seed=3)
    # uniform: ~half the sample at distance 1.0 → mean ≈ 0.5.
    # first-partitions slice: 0.0.  Wide tolerance, binomial noise only.
    assert 0.35 < d < 0.65, d


def test_pq_knn_join_shortlist_registered_for_drain(spark, embs, books):
    """ADVICE r8, updated for the r10 self-draining contract: the
    rescore path's persisted shortlist lands in the shared registry
    while the result is LAZY (the backstop for never-materialized
    handles) and is released the moment the first action completes —
    no InMemoryRelation leaks per join either way."""
    from readwise_vector_db_spark.operators import dedup as dd

    dd.release_detector_cache()
    codes = pq.pq_encode(embs, books, id_col="vec_id")
    queries = (
        embs.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
    )
    before = len(dd._CACHED_FRAMES)
    out = pq.pq_knn_join(
        codes, queries, books, k=3, id_col="vec_id", rescore=embs
    )
    assert len(dd._CACHED_FRAMES) == before + 1  # registered while lazy
    assert out.count() > 0
    assert len(dd._CACHED_FRAMES) == before  # self-drained at the action
    dd.release_detector_cache()
    assert not dd._CACHED_FRAMES


def test_append_drift_gate_per_source_catches_needle(spark, books, tmp_path):
    """r7 verdict item 6: a drifted needle (10% of the batch, its own
    source) DILUTES below the aggregate gate but must trip the grouped
    gate — per-source distortion is the granularity drift happens at."""
    import numpy as np

    from readwise_vector_db_spark.operators import similarity as sim

    rng = np.random.default_rng(43)
    hubs = rng.standard_normal((4, 64)).astype(np.float64)
    base_rows = [
        (i, [float(x) for x in hubs[i % 4] + 0.05 * rng.standard_normal(64)])
        for i in range(200)
    ]
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<float>")
    _, centroids = sim.build_ivf_index(base, n_clusters=4)
    path = str(tmp_path / "ivfpq_needle")
    pq.save_ivfpq_index(
        pq.ivfpq_encode(base, centroids, books), centroids, books, path,
        base_vecs=base,
    )

    # MILD drift: distinguishable per-source, dilutable in aggregate
    drift_hub = hubs[0] + 0.35 * rng.standard_normal(64)
    mixed_rows = [
        (
            1_000 + i,
            [float(x) for x in hubs[i % 4] + 0.05 * rng.standard_normal(64)],
            "healthy",
        )
        for i in range(90)
    ] + [
        (
            2_000 + i,
            [float(x) for x in drift_hub + 0.05 * rng.standard_normal(64)],
            "drifted",
        )
        for i in range(10)
    ]
    mixed = spark.createDataFrame(
        mixed_rows, "vec_id long, embedding array<float>, source string"
    )

    # grouped statistic separates the populations
    per = pq.coarse_distortion_by(mixed, centroids, "source")
    assert set(per) == {"healthy", "drifted"}
    assert per["drifted"] > 3 * per["healthy"]

    # pick the gate limit BETWEEN the diluted aggregate ratio and the
    # worst-group ratio — the window where the r7 aggregate gate is
    # provably blind and the grouped gate provably isn't
    import json

    with open(f"{path}/distortion.json") as f:
        base_d = json.load(f)["base_coarse_distortion"]
    agg_ratio = pq.coarse_distortion(mixed, centroids) / base_d
    worst_ratio = max(per.values()) / base_d
    assert agg_ratio < worst_ratio / 2, (agg_ratio, worst_ratio)
    limit = (agg_ratio * worst_ratio) ** 0.5

    # aggregate gate: the 10% needle dilutes through (documented residue)
    n = pq.append_to_ivfpq_index(mixed, path, max_distortion_ratio=limit)
    assert n == 100
    # grouped gate: the SAME batch is rejected, error names the source
    with pytest.raises(ValueError, match="drifted"):
        pq.append_to_ivfpq_index(
            mixed, path, max_distortion_ratio=limit, source_col="source"
        )

    # max_groups guard is loud, not a silent collect
    with pytest.raises(ValueError, match="max_groups"):
        pq.coarse_distortion_by(mixed, centroids, "vec_id", max_groups=10)


def _correlated_fixture(spark, n=3000, d=64, seed=5):
    """Energy concentrated in a few latent dims, then spread across all
    native axes by a fixed rotation — the regime where independent
    per-subspace quantization wastes its budget and OPQ's learned
    rotation wins (Ge et al. 2013's motivating case)."""
    rng = np.random.default_rng(seed)
    scales = np.concatenate([np.full(8, 4.0), np.full(d - 8, 0.25)])
    z = rng.standard_normal((n, d)) * scales
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = z @ q.T
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_opq_rotation_orthogonal_and_reduces_error(spark):
    df = _correlated_fixture(spark)
    plain = pq.train_pq_codebooks(df, m=8, k=16, sample_rows=2000, iters=8)
    rot, books = pq.train_opq(
        df, m=8, k=16, sample_rows=2000, iters=8, opq_iters=6
    )
    d = rot.shape[0]
    assert rot.shape == (d, d)
    assert np.allclose(rot @ rot.T, np.eye(d), atol=1e-4)  # orthogonal
    sample = np.asarray(
        [r["embedding"] for r in df.limit(1500).collect()], dtype=np.float64
    )
    err_plain = pq.quantization_error(sample, plain)
    err_opq = pq.quantization_error(sample, books, rotation=rot)
    # the rotation must buy a real reduction on the correlated corpus
    assert err_opq < 0.9 * err_plain, (err_opq, err_plain)


def test_opq_encode_search_roundtrip(spark):
    """Rotated codes + rotated query: a planted duplicate pair must rank
    at the top of the ADC scan, and the rescore path must return TRUE
    original-space cosines (rotation never leaks into output scores)."""
    df = _correlated_fixture(spark, n=800)
    rot, books = pq.train_opq(df, m=8, k=16, sample_rows=800, iters=6, opq_iters=4)
    codes = pq.pq_encode(df, books, id_col="vec_id", rotation=rot)
    q_row = df.filter(F.col("vec_id") == 7).first()
    q = [float(v) for v in q_row["embedding"]]
    top = pq.pq_search(codes, q, books, k=5, id_col="vec_id", rotation=rot).collect()
    assert top[0]["vec_id"] == 7  # self comes back first under ADC
    # rescored: exact cosine of the self-match is 1.0
    rescored = pq.pq_search(
        codes, q, books, k=5, id_col="vec_id", rescore=df,
        rescore_factor=8, rotation=rot,
    ).collect()
    assert rescored[0]["vec_id"] == 7 and abs(rescored[0]["score"] - 1.0) < 1e-6


def test_opq_rotation_persists_and_appends_in_frame(spark, tmp_path):
    """The rotation lives WITH the layout: save/load round-trips it and
    append_to_ivfpq_index encodes increments in the rotated frame (a
    frame mismatch would silently destroy recall)."""
    from readwise_vector_db_spark.operators import similarity as sim

    df = _correlated_fixture(spark, n=600)
    rot, books = pq.train_opq(df, m=8, k=16, sample_rows=600, iters=6, opq_iters=4)
    _, centroids = sim.build_ivf_index(df, n_clusters=4)
    codes = pq.ivfpq_encode(df, centroids, books, rotation=rot)
    path = str(tmp_path / "opq_idx")
    pq.save_ivfpq_index(codes, centroids, books, path, rotation=rot)

    loaded = pq.load_rotation(spark, path)
    assert loaded is not None and np.allclose(loaded, rot, atol=1e-6)
    # plain layout → None
    path2 = str(tmp_path / "plain_idx")
    pq.save_ivfpq_index(pq.ivfpq_encode(df, centroids, books), centroids, books, path2)
    assert pq.load_rotation(spark, path2) is None

    inc = _correlated_fixture(spark, n=50, seed=9).withColumn(
        "vec_id", F.col("vec_id") + 10_000
    )
    assert pq.append_to_ivfpq_index(inc, path, max_distortion_ratio=None) == 50
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in spark.read.parquet(f"{path}/codes")
        .filter(F.col("vec_id") >= 10_000)
        .collect()
    }
    want = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq.ivfpq_encode(inc, centroids, books, rotation=rot).collect()
    }
    assert got == want  # appended codes are in the rotated frame


def test_estimate_rescore_factor_tracks_margin_hardness(spark):
    """rf sizing follows measured corpus hardness: a well-separated
    corpus needs a small factor; a margin-concentrated corpus (every
    vector near one direction, margins within ADC error) needs more."""
    rng = np.random.default_rng(17)
    d = 64
    hubs = rng.standard_normal((16, d)) * 3.0
    easy_rows = [
        (i, [float(v) for v in hubs[i % 16] + 0.02 * rng.standard_normal(d)])
        for i in range(2000)
    ]
    easy = spark.createDataFrame(easy_rows, "vec_id long, embedding array<float>")
    base = rng.standard_normal(d) * 5.0
    hard_rows = [
        (i, [float(v) for v in base + 0.05 * rng.standard_normal(d)])
        for i in range(2000)
    ]
    hard = spark.createDataFrame(hard_rows, "vec_id long, embedding array<float>")

    books_e = pq.train_pq_codebooks(easy, m=8, k=16, sample_rows=1500, iters=6)
    books_h = pq.train_pq_codebooks(hard, m=8, k=16, sample_rows=1500, iters=6)
    rf_easy = pq.estimate_rescore_factor(
        easy, books_e, k=10, sample_corpus=1500, n_queries=16
    )
    rf_hard = pq.estimate_rescore_factor(
        hard, books_h, k=10, sample_corpus=1500, n_queries=16
    )
    assert 1 <= rf_easy <= 64  # within the documented max_factor clamp
    assert rf_hard > rf_easy, (rf_easy, rf_hard)
    # the hard corpus needs a materially bigger fetch
    assert rf_hard >= 4, rf_hard

    # rescore_factor="auto" at the operator API resolves through the
    # same probe, memoized per (corpus plan, model, k): poisoning the
    # cached value steers the second call, proving no re-probe ran
    pq._RF_CACHE.clear()
    books_h2 = books_h
    codes_h = pq.pq_encode(hard, books_h2, id_col="vec_id").persist()
    q = [float(v) for v in hard_rows[7][1]]
    out = pq.pq_search(
        codes_h, q, books_h2, k=10, rescore=hard, rescore_factor="auto"
    ).collect()
    assert len(out) == 10 and len(pq._RF_CACHE) == 1
    key = next(iter(pq._RF_CACHE))
    assert pq._RF_CACHE[key][1] == pq.estimate_rescore_factor(
        hard, books_h2, k=10
    )
    import time as _time

    pq._RF_CACHE[key] = (_time.monotonic(), 1)  # poison: must hit cache
    pq.pq_search(
        codes_h, q, books_h2, k=10, rescore=hard, rescore_factor="auto"
    ).collect()
    assert pq._RF_CACHE[key][1] == 1 and len(pq._RF_CACHE) == 1
    # TTL (r10 — stale-while-revalidate): an EXPIRED entry serves the
    # STALE value on the request thread (zero sampling jobs there) and
    # refreshes on a background thread; the fresh probe lands in the
    # cache shortly after
    import threading as _threading

    probe_threads: list[str] = []
    orig_probe = pq.estimate_rescore_factor

    def _spy(*a, **kw):
        probe_threads.append(_threading.current_thread().name)
        return orig_probe(*a, **kw)

    pq._RF_CACHE[key] = (_time.monotonic() - 2 * pq._RF_TTL_SEC, 1)
    pq.estimate_rescore_factor = _spy
    try:
        pq.pq_search(
            codes_h, q, books_h2, k=10, rescore=hard, rescore_factor="auto"
        ).collect()
        # the request thread served the stale factor and never probed
        assert all(t == "rf-refresh" for t in probe_threads)
        deadline = _time.monotonic() + 60
        while pq._RF_CACHE[key][1] == 1 and _time.monotonic() < deadline:
            _time.sleep(0.1)
        assert pq._RF_CACHE[key][1] != 1  # background refresh landed
        assert probe_threads == ["rf-refresh"]
    finally:
        pq.estimate_rescore_factor = orig_probe
    pq._RF_CACHE.clear()
    codes_h.unpersist()
    # auto without rescore is a loud error, not a silent default
    with pytest.raises(ValueError, match="auto"):
        pq.pq_search(codes_h, q, books_h2, k=10, rescore_factor="auto")


def test_pq_knn_join_drains_previous_call(spark, embs, books):
    """Review finding (r8), updated to the r10 structural contract:
    consecutive rescored knn-joins must not accumulate one
    InMemoryRelation each.  The SELF-DRAINING handle now releases its
    shortlist the moment its first action completes (registry returns
    to empty), and the generation registry bounds any unconsumed
    leftovers at the two newest calls."""
    from readwise_vector_db_spark.operators import dedup as dd

    dd.release_detector_cache()
    codes = pq.pq_encode(embs, books, id_col="vec_id")
    queries = (
        embs.filter(F.col("vec_id") < 2)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
    )
    for _ in range(3):
        out = pq.pq_knn_join(
            codes, queries, books, k=3, id_col="vec_id", rescore=embs
        )
        assert len(dd._CACHED_FRAMES) == 1  # this call's lazy shortlist
        assert out.count() > 0
        assert len(dd._CACHED_FRAMES) == 0  # self-drained at the action
    dd.release_detector_cache()


def test_persisted_auto_rf_zero_probe_and_append_refresh(spark, embs, books, tmp_path, monkeypatch):
    """Round-9 (r8 verdict missing #1 / ADVICE #3): rescore_factor sizes
    at BUILD time into {path}/rescore.json; a serving process that
    loads the layout resolves rescore_factor='auto' from the sidecar —
    zero sampling jobs — and an append refreshes the stored numbers by
    population scaling (rf' = ceil(rf_base * rows/sized_at_rows))."""
    import json
    import os

    path = str(tmp_path / "pq_rf")
    pq.save_pq_index(
        pq.pq_encode(embs, books), books, path, base_vecs=embs, rf_ks=(10,)
    )
    assert os.path.isfile(f"{path}/rescore.json")
    with open(f"{path}/rescore.json") as f:
        rec = json.load(f)
    assert set(rec["ks"]) == {"10"} and rec["sized_at_rows"] > 0

    # fresh persisted store, as a new serving process would see it
    with pq._RF_LOCK:
        pq._RF_PERSISTED.clear()
    codes, loaded_books = pq.load_pq_index(spark, path)

    def boom(*a, **k):  # any probe on the serving path is the bug
        raise AssertionError("auto-rf probed despite a persisted layout")

    monkeypatch.setattr(pq, "estimate_rescore_factor", boom)
    q = [float(x) for x in embs.first()["embedding"]]
    out = pq.pq_search(
        codes, q, loaded_books, k=10, rescore=embs, rescore_factor="auto"
    )
    assert out.count() == 10
    # nearest-bucket fallback: k=7 resolves from the k=10 bucket
    assert pq._resolve_rescore_factor("auto", embs, loaded_books, None, 7, "embedding") == rec["ks"]["10"]
    monkeypatch.undo()

    # append refresh: population scaling bumps the stored factors
    ivf_path = str(tmp_path / "ivfpq_rf")
    from readwise_vector_db_spark.operators import similarity as sim

    _, centroids = sim.build_ivf_index(embs, n_clusters=4)
    pq.save_ivfpq_index(
        pq.ivfpq_encode(embs, centroids, books), centroids, books, ivf_path,
        base_vecs=embs, rf_ks=(10,),
    )
    with open(f"{ivf_path}/rescore.json") as f:
        before = json.load(f)
    n0 = before["sized_at_rows"]
    inc_rows = embs.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    appended = pq.append_to_ivfpq_index(inc_rows, ivf_path)
    with open(f"{ivf_path}/rescore.json") as f:
        after = json.load(f)
    assert after["rows"] == n0 + appended
    import math

    want = min(max(1, math.ceil(after["ks_base"]["10"] * after["rows"] / n0)), 64)
    assert after["ks"]["10"] == want >= before["ks"]["10"]


def test_tombstone_delete_and_compaction(spark, embs, books, tmp_path):
    """Round-9 capability: tombstone deletes on persisted PQ/IVF-PQ
    layouts — deleted ids stop serving IMMEDIATELY (load-time anti-join,
    no touch of the code files), appends keep working, and compaction
    physically removes the rows and clears the tombstone set."""
    import os

    from readwise_vector_db_spark.operators import similarity as sim

    path = str(tmp_path / "pq_del")
    pq.save_pq_index(pq.pq_encode(embs, books), books, path)
    codes, loaded_books = pq.load_pq_index(spark, path)
    total = codes.count()
    q = [float(x) for x in embs.first()["embedding"]]
    before = [r["vec_id"] for r in pq.pq_search(codes, q, loaded_books, k=5).collect()]
    victim = before[0]  # the top hit — deletion must be visible at rank 1

    assert pq.delete_from_index(spark, path, [victim]) == 1
    codes2, _ = pq.load_pq_index(spark, path)
    assert codes2.count() == total - 1
    after = [r["vec_id"] for r in pq.pq_search(codes2, q, loaded_books, k=5).collect()]
    assert victim not in after and after[0] == before[1]
    # delete accepts a DataFrame too; duplicate tombstones are harmless
    pq.delete_from_index(
        spark, path, spark.createDataFrame([(victim,)], "vec_id long")
    )
    assert pq.load_pq_index(spark, path)[0].count() == total - 1

    # compaction: physical removal, tombstones cleared, results unchanged
    n = pq.compact_index(spark, path)
    assert n == total - 1
    assert not os.path.isdir(f"{path}/tombstones")
    codes3, _ = pq.load_pq_index(spark, path)
    assert codes3.count() == total - 1
    assert [
        r["vec_id"] for r in pq.pq_search(codes3, q, loaded_books, k=5).collect()
    ] == after

    # IVF-PQ: same flow, cluster partitioning preserved through compaction
    ipath = str(tmp_path / "ivfpq_del")
    _, centroids = sim.build_ivf_index(embs, n_clusters=4)
    pq.save_ivfpq_index(
        pq.ivfpq_encode(embs, centroids, books), centroids, books, ipath
    )
    icodes, icents, ibooks = pq.load_ivfpq_index(spark, ipath)
    itotal = icodes.count()
    top = [
        r["vec_id"]
        for r in pq.ivfpq_search(icodes, icents, ibooks, q, k=5, nprobe=4).collect()
    ]
    pq.delete_from_index(spark, ipath, top[:2])
    icodes2, _, _ = pq.load_ivfpq_index(spark, ipath)
    assert icodes2.count() == itotal - 2
    got = [
        r["vec_id"]
        for r in pq.ivfpq_search(icodes2, icents, ibooks, q, k=5, nprobe=4).collect()
    ]
    assert not set(top[:2]) & set(got)
    assert pq.compact_index(spark, ipath) == itotal - 2
    # the cluster partition layout survived (partition pruning intact)
    assert any(
        name.startswith("cluster=") for name in os.listdir(f"{ipath}/codes")
    )
    icodes3, _, _ = pq.load_ivfpq_index(spark, ipath)
    assert [
        r["vec_id"]
        for r in pq.ivfpq_search(icodes3, icents, ibooks, q, k=5, nprobe=4).collect()
    ] == got


def test_compact_crash_recovery_and_concurrent_tombstones(spark, embs, books, tmp_path):
    """r9 review findings + r10 ADVICE: (a) a crash between
    compact_index's two renames self-heals at the next load —
    roll-forward ONLY to the stage named in the swap-intent marker; a
    stale orphan stage from an aborted run (no intent) must NOT be
    installed (it may predate later appends/tombstones); (b) a
    tombstone landing after compaction's file snapshot survives the
    compaction and still applies."""
    import os
    import shutil

    path = str(tmp_path / "pq_crash")
    pq.save_pq_index(pq.pq_encode(embs, books), books, path)
    total = spark.read.parquet(f"{path}/codes").count()

    # (a1) crash mid-swap WITH intent: codes renamed away, committed
    # stage in place, intent names it → roll FORWARD to the stage
    shutil.copytree(f"{path}/codes", f"{path}/.codes_compact_777_1")
    with open(f"{path}/.codes_swap_intent", "w") as f:
        f.write(".codes_compact_777_1")
    os.rename(f"{path}/codes", f"{path}/.codes_old_777_1")
    codes, _ = pq.load_pq_index(spark, path)  # must self-heal
    assert os.path.isdir(f"{path}/codes") and codes.count() == total
    assert not os.path.exists(f"{path}/.codes_swap_intent")
    assert not os.path.isdir(f"{path}/.codes_compact_777_1")
    shutil.rmtree(f"{path}/.codes_old_777_1", ignore_errors=True)

    # (a2) crash mid-WRITE (orphan stage, NO intent): the orphan is a
    # stale snapshot missing a row — recovery must roll BACK to the old
    # dir, never install the orphan
    shutil.copytree(f"{path}/codes", f"{path}/.codes_compact_888_1")
    stale_file = next(
        f"{path}/.codes_compact_888_1/{n}"
        for n in os.listdir(f"{path}/.codes_compact_888_1")
        if n.endswith(".parquet")
    )
    os.remove(stale_file)  # make the orphan provably stale
    os.rename(f"{path}/codes", f"{path}/.codes_old_888_1")
    codes, _ = pq.load_pq_index(spark, path)
    assert codes.count() == total  # rolled back, not the gutted orphan
    ids = [r["vec_id"] for r in codes.limit(2).collect()]
    # the next compaction clears the orphan so it can never resurface
    pq.compact_index(spark, path)
    assert not os.path.isdir(f"{path}/.codes_compact_888_1")

    # concurrent tombstone: present in the dir but written AFTER the
    # compaction's file snapshot — emulate by monkey-ordering: snapshot
    # happens at compact entry, so write the late tombstone via a
    # pre-listed compact.  Here: tombstone A, compact (consumes it),
    # then tombstone B and verify B still applies after compaction.
    pq.delete_from_index(spark, path, [ids[0]])
    assert pq.compact_index(spark, path) == total - 1
    pq.delete_from_index(spark, path, [ids[1]])
    assert pq.load_pq_index(spark, path)[0].count() == total - 2


def test_tombstone_column_mismatch_raises(spark, embs, books, tmp_path):
    """r10 ADVICE: tombstones written under an id_col absent from the
    codes schema must raise loudly, never guess a join key (guessing
    matched nothing, so deleted ids silently kept serving)."""
    path = str(tmp_path / "pq_badtomb")
    pq.save_pq_index(pq.pq_encode(embs, books), books, path)
    pq.delete_from_index(spark, path, ["1", "2"], id_col="doc_id")
    with pytest.raises(ValueError, match="doc_id"):
        pq.load_pq_index(spark, path)[0].count()


def test_drift_gate_cardinality_guard(spark, embs, books, tmp_path, monkeypatch):
    """r9 review finding: a per-row source_col must fail loudly (group
    by a coarser label), not silently gate on the worst single vector —
    the guard coarse_distortion_by carries, restored on the scalar-agg
    gate path."""
    from readwise_vector_db_spark.operators import similarity as sim

    sub = embs.limit(200)
    _, centroids = sim.build_ivf_index(sub, n_clusters=4)
    path = str(tmp_path / "ivfpq_guard")
    pq.save_ivfpq_index(
        pq.ivfpq_encode(sub, centroids, books), centroids, books, path,
        base_vecs=sub, rf_ks=(),
    )
    inc = sub.limit(50).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding",
        F.col("vec_id").cast("string").alias("src"),
    )
    monkeypatch.setattr(pq, "DRIFT_MAX_GROUPS", 10)
    with pytest.raises(ValueError, match="coarser"):
        pq.append_to_ivfpq_index(inc, path, source_col="src")
    # a sane-cardinality label passes the guard (and the gate itself)
    monkeypatch.setattr(pq, "DRIFT_MAX_GROUPS", 10_000)
    ok = sub.limit(20).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding",
        F.lit("crawl-a").alias("src"),
    )
    assert pq.append_to_ivfpq_index(ok, path, source_col="src") == 20


def test_layout_version_stamp_and_migration(spark, embs, books, tmp_path):
    """r10 verdict item 2 (index-layout half): layouts carry a
    layout-version stamp; loaders refuse wrong-family and
    newer-than-engine layouts with a migration hint; unstamped legacy
    layouts load as v1 and migrate_layout stamps them in place."""
    import json
    import os

    from readwise_vector_db_spark.layout import (
        LAYOUT_VERSION,
        LayoutVersionError,
        migrate_layout,
        read_stamp,
    )

    path = str(tmp_path / "pq_stamped")
    pq.save_pq_index(pq.pq_encode(embs, books), books, path)
    assert read_stamp(path) == {"layout_version": LAYOUT_VERSION, "family": "pq"}
    pq.load_pq_index(spark, path)  # stamped current: loads

    # wrong family refuses loudly
    with pytest.raises(LayoutVersionError, match="family"):
        pq.load_ivfpq_index(spark, path)

    # newer-engine layout refuses with a hint
    with open(f"{path}/layout.json", "w") as f:
        json.dump({"layout_version": LAYOUT_VERSION + 1, "family": "pq"}, f)
    with pytest.raises(LayoutVersionError, match="newer engine"):
        pq.load_pq_index(spark, path)

    # legacy (pre-stamp) layout: loads as v1, migrates in place
    os.remove(f"{path}/layout.json")
    pq.load_pq_index(spark, path)
    assert migrate_layout(path, "pq", required=("codes", "codebooks")) == LAYOUT_VERSION
    assert read_stamp(path)["family"] == "pq"
    # migration refuses a directory that isn't the claimed family
    with pytest.raises(LayoutVersionError, match="missing"):
        migrate_layout(str(tmp_path / "empty"), "pq", required=("codes",))


@pytest.mark.slow  # recall-restoration e2e soak (r13: excluded from the default run)
def test_recluster_cells_restores_gate_and_recall(spark, tmp_path):
    """r10 verdict item 3: targeted drift remediation.  A drifted
    append (shifted Gaussian mixture — the tools/bench_ann_recall.py
    drift regime at test scale) first FAILS the gate; recluster_cells
    splits only the offending cells (other partitions bit-untouched,
    bytes_rewritten < total); the same append then passes the gate and
    shifted-query recall@10 beats the force-append control."""
    import os

    from readwise_vector_db_spark.operators import similarity as sim

    d, n, n_centers, sigma = 48, 3000, 12, 0.5
    rng = np.random.default_rng(5)
    centers_a = rng.standard_normal((n_centers, d)).astype(np.float32)
    base = centers_a[rng.integers(0, n_centers, n)] + sigma * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    rng2 = np.random.default_rng(29)
    centers_b = rng2.standard_normal((n_centers, d)).astype(np.float32)
    n_inc = n // 2
    drifted = centers_b[rng2.integers(0, n_centers, n_inc)] + (
        sigma * rng2.standard_normal((n_inc, d)).astype(np.float32)
    )

    def to_df(x, id0=0):
        return spark.createDataFrame(
            [(id0 + i, [float(v) for v in x[i]]) for i in range(len(x))],
            "vec_id long, embedding array<float>",
        )

    base_df, drifted_df = to_df(base), to_df(drifted, id0=1_000_000)
    _, cents = sim.build_ivf_index(base_df, n_clusters=24)
    books = pq.train_pq_codebooks(base_df, m=8, k=64, sample_rows=3000)

    def build(path):
        pq.save_ivfpq_index(
            pq.ivfpq_encode(base_df, cents, books), cents, books, path,
            base_vecs=base_df, rf_ks=(),
        )

    path = str(tmp_path / "remediate")
    build(path)

    # 1. the drifted append fails the gate
    with pytest.raises(ValueError, match="stale"):
        pq.append_to_ivfpq_index(drifted_df, path)

    # snapshot untouched-partition files before remediation
    def part_files(p):
        return {
            f"{root}/{fn}": os.path.getmtime(f"{root}/{fn}")
            for root, _, files in os.walk(f"{p}/codes")
            for fn in files
        }

    before = part_files(path)

    # 2. targeted remediation
    stats = pq.recluster_cells(spark, path, drifted_vecs=drifted_df, n_splits=4)
    assert stats["cells_split"] and stats["new_cells"]
    assert 0 < stats["bytes_rewritten"] < stats["bytes_total"]
    touched = {f"cluster={c}" for c in stats["cells_split"] + stats["new_cells"]}
    after = part_files(path)
    for f, mt in before.items():
        part = f.split("/codes/")[1].split("/")[0]
        if part not in touched:
            assert after.get(f) == mt, f"untouched partition rewritten: {f}"

    # 3. the same append now passes the gate and lands
    assert pq.append_to_ivfpq_index(drifted_df, path) == n_inc
    codes2, cents2, books2 = pq.load_ivfpq_index(spark, path)
    assert codes2.count() == n + n_inc

    # 4. recall control: force-append into an unremediated copy
    forced = str(tmp_path / "forced")
    build(forced)
    pq.append_to_ivfpq_index(drifted_df, forced, max_distortion_ratio=None)
    codes_f, cents_f, books_f = pq.load_ivfpq_index(spark, forced)

    full = np.vstack([base, drifted])
    ids = np.concatenate([np.arange(n), 1_000_000 + np.arange(n_inc)])
    queries = drifted[:12]

    def exact_top(qi):
        x = full / np.maximum(np.linalg.norm(full, axis=1, keepdims=True), 1e-12)
        q = queries[qi] / np.linalg.norm(queries[qi])
        return set(ids[np.argsort(-(x @ q))[:10]].tolist())

    full_df = to_df(base).unionByName(to_df(drifted, id0=1_000_000))

    def recall(codes, cts, bks):
        rs = []
        for qi in range(len(queries)):
            got = {
                int(r["vec_id"])
                for r in pq.ivfpq_search(
                    codes, cts, bks, [float(v) for v in queries[qi]],
                    k=10, nprobe=4, rescore=full_df, rescore_factor=8,
                ).collect()
            }
            rs.append(len(got & exact_top(qi)) / 10)
        return sum(rs) / len(rs)

    r_remediated = recall(codes2, cents2, books2)
    r_forced = recall(codes_f, cents_f, books_f)
    assert r_remediated > r_forced, (r_remediated, r_forced)
    assert r_remediated >= 0.6, r_remediated


def test_interleaved_rescored_knn_joins_single_scan(spark, embs, books):
    """r10 verdict item 4: two INTERLEAVED lazy rescored pq_knn_join
    results must each materialize with a single ADC scan — planning the
    second join must not drop the first join's shortlist persist (the
    old entry drain did; each materialization then re-ran the full scan
    twice).  Scan volume counted by an accumulator in a pass-through
    stage under the codes scan."""
    acc = spark.sparkContext.accumulator(0)
    codes = pq.pq_encode(embs, books)
    n = codes.count()

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = codes.mapInPandas(counting, schema=codes.schema)
    q = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in embs.orderBy("vec_id").limit(4).collect()
    ]
    qdf1 = spark.createDataFrame(q[:2], "query_id long, query_vec array<float>")
    qdf2 = spark.createDataFrame(q[2:], "query_id long, query_vec array<float>")
    vecs = embs.select("vec_id", "embedding")

    r1 = pq.pq_knn_join(counted, qdf1, books, k=5, rescore=vecs, rescore_factor=4)
    r2 = pq.pq_knn_join(counted, qdf2, books, k=5, rescore=vecs, rescore_factor=4)
    rows1 = r1.collect()  # materialized AFTER r2 was planned
    rows2 = r2.collect()
    assert {r["query_id"] for r in rows1} == {q[0][0], q[1][0]}
    assert {r["query_id"] for r in rows2} == {q[2][0], q[3][0]}
    # one ADC scan per join (cache-hit on the plan's second shortlist
    # reference); the broken path re-scans — ≥ 4n total
    assert acc.value <= int(2.5 * n), (acc.value, n)


def test_pq_search_many_matches_per_query_loop(spark, embs, books):
    """Round-12 batched probe: pq_search_many must return EXACTLY the
    rows the per-query pq_search loop returns — same candidates, same
    rescored scores, same per-query top-k cut."""
    codes = pq.pq_encode(embs, books).persist()
    qrows = (
        embs.filter(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    batch = {
        (int(r["query_id"]), int(r["vec_id"]), float(r["score"]))
        for r in pq.pq_search_many(
            codes, queries, books, k=5, rescore=embs, rescore_factor=4
        ).collect()
    }
    loop = set()
    for qid, qvec in queries:
        for r in pq.pq_search(
            codes, qvec, books, k=5, rescore=embs, rescore_factor=4
        ).collect():
            loop.add((qid, int(r["vec_id"]), float(r["score"])))
    assert batch == loop
    codes.unpersist()


def test_ivfpq_search_many_matches_per_query_loop(spark, embs, books):
    """Batched IVF-PQ probe over the union of probed cells returns the
    same per-query rows as the sequential ivfpq_search calls."""
    from readwise_vector_db_spark.operators import similarity as sim

    _, cents = sim.build_ivf_index(embs, n_clusters=4)
    codes = pq.ivfpq_encode(embs, cents, books).persist()
    qrows = (
        embs.filter(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    batch = {
        (int(r["query_id"]), int(r["vec_id"]), float(r["score"]))
        for r in pq.ivfpq_search_many(
            codes, cents, books, queries, k=5, nprobe=2,
            rescore=embs, rescore_factor=4,
        ).collect()
    }
    loop = set()
    for qid, qvec in queries:
        for r in pq.ivfpq_search(
            codes, cents, books, qvec, k=5, nprobe=2,
            rescore=embs, rescore_factor=4,
        ).collect():
            loop.add((qid, int(r["vec_id"]), float(r["score"])))
    assert batch == loop
    codes.unpersist()


def test_pq_search_many_isin_cap_drops_pushdown_not_rows(
    spark, embs, books, monkeypatch
):
    """Round 13 (r12 residue): the candidate-union IN literal on the
    batched rescore scan is a pushdown aid only — with the cap forced
    to 0 (literal dropped, broadcast candidate join alone bounds the
    rows) the output must be row-identical to the default path."""
    codes = pq.pq_encode(embs, books).persist()
    qrows = (
        embs.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def run():
        return {
            (int(r["query_id"]), int(r["vec_id"]), float(r["score"]))
            for r in pq.pq_search_many(
                codes, queries, books, k=5, rescore=embs, rescore_factor=4
            ).collect()
        }

    with_pushdown = run()
    monkeypatch.setattr(pq, "ISIN_PUSHDOWN_MAX_IDS", 0)
    without_pushdown = run()
    assert with_pushdown == without_pushdown
    codes.unpersist()
