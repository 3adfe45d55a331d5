"""Training-mix operators: determinism, exactness, composition, packing math."""

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import sampling as sp
from readwise_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF_SMOKE, "documents")
    df.cache().count()
    return df


def test_mixture_sample_deterministic_and_monotone(docs):
    half = sp.mixture_sample(docs, {}, default_rate=0.5)
    again = sp.mixture_sample(docs, {}, default_rate=0.5)
    ids = {r["doc_id"] for r in half.select("doc_id").collect()}
    assert ids == {r["doc_id"] for r in again.select("doc_id").collect()}
    n = docs.count()
    assert 0.35 * n < len(ids) < 0.65 * n  # rate is approximately honored
    # raising the rate only ADDS documents (bucket thresholds nest)
    more = {r["doc_id"] for r in
            sp.mixture_sample(docs, {}, default_rate=0.8).select("doc_id").collect()}
    assert ids <= more


def test_mixture_sample_per_group_rates(docs):
    out = sp.mixture_sample(docs, {"src1": 1.0, "src2": 0.0}, default_rate=0.5)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["src1"] == full["src1"]  # rate 1.0 keeps everything
    assert "src2" not in by_src  # rate 0.0 keeps nothing


def test_dataset_split_total_and_stable_under_growth(docs):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sp.dataset_split(docs, weights)
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]
    # split is a pure function of the id: a subset corpus assigns the
    # same labels (no contamination when the dataset version changes)
    sub = sp.dataset_split(docs.filter(F.col("doc_id") % 3 == 0), weights)
    full_map = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert full_map[r["doc_id"]] == r["split"]


def test_quota_sample_exact_cap(docs):
    out = sp.quota_sample(docs, quota=3)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in per)
    # groups with >= 3 docs are filled exactly to quota
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r["source"]: r["n"] for r in per}
    for src, n in full.items():
        assert got.get(src, 0) == min(n, 3)


def test_rate_cap_composes_exactly_with_quota_sample(docs):
    counts = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    exact = {r["doc_id"] for r in
             sp.quota_sample(docs, quota=3).select("doc_id").collect()}
    # margin 3 on these small groups keeps well over quota per group
    capped = sp.rate_cap(docs, counts, quota=3, margin=3.0)
    composed = {r["doc_id"] for r in
                sp.quota_sample(capped, quota=3).select("doc_id").collect()}
    assert composed == exact


def test_pack_sequences_budgets_in_bpe_tokens(docs, spark):
    """Sequence packing composes with the BPE tokenizer: pass an Arrow-
    batched ``bpe_count`` column as ``token_col`` and the shard streams
    budget in real BPE tokens (reference cap semantics,
    ``core/embedding.py:9-14``) — same contiguity contract."""
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.functions.bpe import bpe_count

    counted = docs.withColumn("bpe_tokens", bpe_count(F.col("text")))
    out = sp.pack_sequences(
        counted, capacity=256, n_shards=2, token_col="bpe_tokens"
    ).collect()
    assert out and all(r["bpe_tokens"] > 0 for r in out)
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            assert r["start_tok"] == offset
            offset += r["bpe_tokens"]


def test_pack_sequences_stream_is_contiguous(docs):
    capacity = 1000
    out = sp.pack_sequences(docs, capacity=capacity, n_shards=4,
                            token_col="n_chars").collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            assert r["start_tok"] == offset  # no gaps, no overlaps
            end = offset + r["n_chars"]
            assert r["seq_first"] == offset // capacity
            assert r["seq_last"] == (end - 1) // capacity
            assert r["seq_first"] <= r["seq_last"]
            offset = end


# --- shuffle_order ----------------------------------------------------------


def test_shuffle_order_is_a_permutation(spark):
    from readwise_vector_db_spark.operators.sampling import shuffle_order

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_order(df, seed="s1", n_buckets=16).collect()
    poss = sorted(r["shuffle_pos"] for r in out)
    assert poss == list(range(500))


def test_shuffle_order_deterministic_across_partitioning(spark):
    from readwise_vector_db_spark.operators.sampling import shuffle_order

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_order(df, seed="e").collect()}
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_order(df.repartition(13), seed="e", n_buckets=8).collect()
    }
    # same seed + same bucket count -> identical positions regardless
    # of input partitioning; a different bucket count is a different
    # (still valid) permutation
    b_same = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_order(df.repartition(13), seed="e").collect()
    }
    assert a == b_same
    assert sorted(b.values()) == list(range(300))


def test_shuffle_order_broadcast_offsets_past_threshold(spark):
    """Past _OFFSET_LIT_MAX buckets the offsets become a broadcast-joined
    frame — the plan must carry a join, NOT a 2·n_buckets create_map
    literal — and the positions must still be the exact (bucket, hash,
    id) lexicographic order."""
    from readwise_vector_db_spark.operators.dedup import hash64
    from readwise_vector_db_spark.operators.sampling import (
        _OFFSET_LIT_MAX,
        shuffle_order,
    )

    nb = _OFFSET_LIT_MAX + 476  # 1500 buckets: the broadcast regime
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_order(df, n_buckets=nb)
    rows = out.collect()
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(500))
    # reference order recomputed from the documented definition
    h = hash64(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")), "xxhash64"
    )
    ref = [
        r["doc_id"]
        for r in df.withColumn("_h", h)
        .withColumn("_b", F.pmod("_h", F.lit(nb)))
        .orderBy("_b", "_h", "doc_id")
        .collect()
    ]
    got = {r["shuffle_pos"]: r["doc_id"] for r in rows}
    assert [got[i] for i in range(500)] == ref
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    assert "map(" not in plan  # no literal offset map in the plan text


def test_shuffle_order_seed_changes_order(spark):
    from readwise_vector_db_spark.operators.sampling import shuffle_order

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_order(df, seed="x").collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_order(df, seed="y").collect()}
    assert a != b  # overwhelmingly
    assert sorted(a.values()) == sorted(b.values())


def test_pack_greedy_invariants_and_hand_case(spark):
    from readwise_vector_db_spark.operators.sampling import (
        pack_greedy,
        packing_efficiency,
    )

    rows = [(i, n) for i, n in enumerate([9, 5, 4, 2, 15])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_greedy(df, capacity=10, n_shards=1).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 5
    # NFD order 15, 9, 5, 4, 2: oversize 15 → own overflow bin; 9 alone;
    # 5+4 share; 2 alone
    assert by_id[4]["overflow"] and by_id[4]["bin_fill"] == 15
    assert not any(by_id[i]["overflow"] for i in range(4))
    assert by_id[1]["bin"] == by_id[2]["bin"]  # 5 and 4 pack together
    assert len({r["bin"] for r in out}) == 4
    # invariant: every non-overflow bin within capacity
    fills = {}
    for r in out:
        if not r["overflow"]:
            fills[r["bin"]] = fills.get(r["bin"], 0) + r["n_tokens"]
    assert all(f <= 10 for f in fills.values())
    eff = packing_efficiency(
        pack_greedy(df, capacity=10, n_shards=1), capacity=10
    )
    assert eff == (9 + 9 + 2) / 30


def test_pack_greedy_scale_and_determinism(spark):
    import random

    from readwise_vector_db_spark.operators.sampling import (
        pack_greedy,
        packing_efficiency,
    )

    rng = random.Random(11)
    rows = [(i, rng.randint(10, 900)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = pack_greedy(df, capacity=1024, n_shards=8)
    got = {(r["doc_id"], r["shard"], r["bin"]) for r in a.collect()}
    again = {
        (r["doc_id"], r["shard"], r["bin"])
        for r in pack_greedy(df, capacity=1024, n_shards=8).collect()
    }
    assert got == again and len(got) == 2000
    # per-(shard,bin) fills within capacity; decreasing-order greedy
    # should waste little on uniform lengths
    eff = packing_efficiency(a, capacity=1024)
    assert eff >= 0.95, eff  # BFD; next-fit-decreasing measured 0.73 here
    with pytest.raises(ValueError, match="capacity"):
        pack_greedy(df, capacity=0)


def test_dataset_split_stratified_exact_proportions(spark):
    from readwise_vector_db_spark.operators.sampling import (
        dataset_split_stratified,
    )

    rows = [(i, f"s{i % 3}") for i in range(300)] + [(1000 + i, "tiny") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = dataset_split_stratified(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, strata_col="source"
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], {}).setdefault(r["split"], 0)
        per[r["source"]][r["split"]] += 1
    # exact proportions per stratum (100 rows → 80/10/10; 10 → 8/1/1)
    for src, counts in per.items():
        n = sum(counts.values())
        assert counts["train"] == round(0.8 * n), (src, counts)
        assert counts["val"] == round(0.1 * n), (src, counts)
        assert counts["test"] == round(0.1 * n), (src, counts)
    # weights must be sane
    import pytest as _pt

    with _pt.raises(ValueError, match="sum"):
        dataset_split_stratified(df, {"a": 0.9, "b": 0.2}, strata_col="source")


def test_group_rank_keeps_null_groups_and_column_order(spark):
    """r9 review finding: the two-phase rank's join must be NULL-SAFE on
    the group (rows with missing metadata are a real stratum — the old
    window formulation kept them) and must preserve the caller's column
    order."""
    from readwise_vector_db_spark.operators.sampling import (
        dataset_split_stratified,
        quota_sample,
    )

    rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = dataset_split_stratified(
        df, {"train": 0.5, "val": 0.25, "test": 0.25}, "source"
    )
    assert out.columns == ["doc_id", "source", "split"]
    got = out.collect()
    assert len(got) == 5  # NULL-source rows survive
    assert sum(1 for r in got if r["source"] is None) == 2
    assert all(r["split"] in ("train", "val", "test") for r in got)

    q = quota_sample(df, quota=1, group_col="source")
    assert q.columns == ["doc_id", "source"]
    by_src = {}
    for r in q.collect():
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src.get(None) == 1 and by_src.get("a") == 1 and by_src.get("b") == 1
