"""Training-mix construction: deterministic sampling, splits, packing.

The reference serves one corpus verbatim; a 100 TB training-data
pipeline additionally needs to SHAPE the corpus — cap over-represented
domains, mix sources at chosen rates, carve reproducible train/val/test
splits, and pack documents into fixed token-budget sequences.  All four
operators here are deterministic functions of the data (hash-seeded, no
RNG state), so reruns and retries produce byte-identical samples — the
property that makes a training mix auditable.

Scale notes per operator:

- ``mixture_sample`` / ``dataset_split`` are MAP-ONLY: a hash and a
  comparison per row, no shuffle, trivially parallel at any size.
- ``quota_sample`` shuffles once on the group key (the window's
  partitionBy).  A group bigger than one executor's partition is the
  skew case: for those, ``rate_cap`` first (map-only hash threshold
  from a known group count) shrinks the group to ~quota before the
  exact window runs — the same two-phase trick as the df-capped
  shingle join in operators/dedup.py.
- ``pack_sequences`` windows within a shard, so parallelism = number of
  shards and state per task = one shard's rows; shards are the unit a
  real pipeline writes as one training file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from readwise_vector_db_spark.operators.dedup import hash64

# hash-bucket resolution for rate comparisons: rates are quantized to
# 1/2**20 ≈ 1e-6, plenty for mix weights and exactly representable
_RATE_BITS = 20
_RATE_DEN = 1 << _RATE_BITS
# shuffle_order: bucket-offset maps up to this size stay a create_map
# literal; larger bucket counts broadcast-join the offsets frame (py4j
# literal pathology past ~10³ elements)
_OFFSET_LIT_MAX = 1024


def _bucket(col: Column | str, salt: str, base_hash: str) -> Column:
    """Uniform bucket in [0, 2**20) from a salted 64-bit hash.  The salt
    decorrelates different sampling decisions over the same ids (being
    sampled INTO the mix must not bias WHICH split you land in)."""
    c = F.col(col) if isinstance(col, str) else col
    h = hash64(F.concat(F.lit(salt + ":"), c.cast("string")), base_hash)
    return F.pmod(h, F.lit(_RATE_DEN))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    base_hash: str = "xxhash64",
    salt: str = "mix",
) -> DataFrame:
    """Keep each group's rows at its configured rate (deterministic
    Bernoulli by id hash).  Map-only: no shuffle at any scale.

    ``rates`` maps group value → keep-rate in [0, 1]; unlisted groups
    get ``default_rate``.  The row set is a pure function of (id, salt),
    so incremental reruns keep exactly the same documents.
    """
    rate_expr = F.lit(int(default_rate * _RATE_DEN))
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(group_col) == F.lit(value), F.lit(int(rate * _RATE_DEN))
        ).otherwise(rate_expr)
    return df.filter(_bucket(id_col, salt, base_hash) < rate_expr)


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
    base_hash: str = "xxhash64",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given
    weights (must sum to ≤ 1; any remainder is an implicit holdout
    labelled NULL).  Map-only and stable: a document's split never
    changes as the corpus around it grows, because it depends only on
    the document's own id hash — the property that keeps eval sets
    uncontaminated across dataset versions.
    """
    b = _bucket(id_col, salt, base_hash)
    bounds = []
    cum = 0.0
    for name, w in weights.items():
        cum += w
        bounds.append((name, int(round(cum * _RATE_DEN))))
    # chain from the largest threshold down so the smallest matching
    # bucket range wins: bucket < hi_1 ? name_1 : (bucket < hi_2 ? ...)
    expr = F.lit(None).cast("string")
    for name, hi in sorted(bounds, key=lambda t: -t[1]):
        expr = F.when(b < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def _two_phase_group_rank(
    df: DataFrame,
    group_col: str,
    id_col: str,
    salt: str,
    base_hash: str,
    n_subbuckets: int = 32,
) -> DataFrame:
    """``df`` + ``_rk`` (1-based row number within ``group_col`` ordered
    by the salted id hash then id) + ``_tot`` (group size) — computed
    WITHOUT a window partitioned by the group alone, so a hot group
    never serializes into one task (round 9; the ``shuffle_order``
    discipline shared by the stratified split and the quota cap):

    1. rows sub-bucket by CONTIGUOUS ranges of the hash
       (order-preserving, so ranks are bit-identical to the
       single-window formulation);
    2. per-(group, sub-bucket) counts fold with partial aggregation
       (the hot group's rows combine map-side);
    3. cumulative offsets come from a window over the COUNTS FRAME —
       ≤ n_subbuckets rows per group, trivially balanced — entirely
       lazily: no driver collect, no extra job, no cardinality cap
       (unlike ``shuffle_order``'s global variant, the offsets here are
       per-group so the frame stays aggregation-sized);
    4. the rank window partitions by (group, sub-bucket) and adds the
       joined offset (NULL-SAFE on the group — rows with missing
       metadata are a real stratum and must survive).  The join is left
       to Catalyst: auto-broadcast while the offsets frame is small,
       shuffle-join (on the composite key — skew-free) past the
       threshold.

    Determinism requirement: the counts phase and the rank phase scan
    ``df`` INDEPENDENTLY, so ``df`` must be deterministic (no
    ``sample()``/``rand()`` upstream without a seed+materialization) or
    ``_rk`` can disagree with ``_tot`` — the same contract Spark itself
    imposes on any recomputed lineage, stated here because the replaced
    single-window form was accidentally immune.

    Callers drop the ``_``-prefixed columns."""
    if _RATE_DEN % n_subbuckets:
        raise ValueError("n_subbuckets must divide the hash range")
    width = _RATE_DEN // n_subbuckets
    b = _bucket(id_col, salt, base_hash)
    keyed = df.withColumn("_sb", b).withColumn(
        "_sub", F.floor(F.col("_sb") / F.lit(width)).cast("int")
    )
    counts = keyed.groupBy(group_col, "_sub").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        W.partitionBy(group_col)
        .orderBy("_sub")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col(group_col).alias("_g2"),
        F.col("_sub").alias("_sub2"),
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(W.partitionBy(group_col)).alias("_tot"),
    )
    w_rank = W.partitionBy(group_col, "_sub").orderBy(F.asc("_sb"), F.asc(id_col))
    # NULL-SAFE join on the group (missing metadata is a real stratum —
    # windows kept NULL-group rows and so must the two-phase form; a
    # plain equi-join silently dropped them, r9 review finding), with
    # explicit renamed right-side keys so the joined frame keeps the
    # caller's column order
    return (
        keyed.join(
            offsets,
            keyed[group_col].eqNullSafe(offsets["_g2"])
            & (keyed["_sub"] == offsets["_sub2"]),
        )
        .drop("_g2", "_sub2")
        .withColumn("_rk", F.row_number().over(w_rank) + F.col("_off"))
    )


def dataset_split_stratified(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    split_col: str = "split",
    base_hash: str = "xxhash64",
    salt: str = "split",
) -> DataFrame:
    """EXACT per-stratum splits: within each stratum, rows are ranked by
    (id-hash, id) and cut at the cumulative-weight boundaries of the
    stratum's own row count, so every stratum lands within one row of
    its target proportion (``dataset_split``'s map-only hash split is
    proportional only in expectation — ±binomial noise per stratum,
    which matters for small strata and for eval sets that must be
    exactly sized).  The honest trade: a row's split now depends on its
    stratum's membership, so appends can migrate rows between splits —
    use the stable hash split when contamination-across-versions is the
    constraint, this when exact stratification is.  Weights must sum to
    ≤ 1 (remainder → NULL holdout).

    Skew (round 9 — the span-cut discipline applied here): the stratum
    rank does NOT run as a window partitioned by the stratum alone (a
    hot stratum — half the corpus from one source — would serialize
    into one task's sort).  Instead the same two-phase shape as
    ``shuffle_order``: rows sub-bucket by CONTIGUOUS ranges of the
    split hash (order-preserving, so ranks are bit-identical to the
    single-window formulation), per-(stratum, sub-bucket) counts fold
    with partial aggregation, cumulative offsets come LAZILY from
    windows over the aggregation-sized counts frame (no driver
    collect), and the rank window partitions by (stratum, sub-bucket) —
    the hot stratum spreads across the helper's sub-buckets (32
    internally; raise it in ``_two_phase_group_rank`` for clusters
    whose hot groups outgrow 32-way spreading).
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError("split weights must sum to <= 1")
    ranked = _two_phase_group_rank(df, strata_col, id_col, salt, base_hash)
    frac = F.col("_rk").cast("double") / F.col("_tot")
    bounds, cum = [], 0.0
    for name, wt in weights.items():
        cum += wt
        bounds.append((name, cum))
    expr = F.lit(None).cast("string")
    for name, hi in sorted(bounds, key=lambda t: -t[1]):
        expr = F.when(frac <= F.lit(hi), F.lit(name)).otherwise(expr)
    return ranked.withColumn(split_col, expr).drop("_sb", "_sub", "_off", "_tot", "_rk")


def quota_sample(
    df: DataFrame,
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    base_hash: str = "xxhash64",
    salt: str = "quota",
) -> DataFrame:
    """Exact per-group cap: keep at most ``quota`` rows per group,
    chosen by hash order (a deterministic uniform sample without
    replacement).  Round 9: the rank runs through
    :func:`_two_phase_group_rank`, so a hot group spreads across
    sub-bucket tasks instead of serializing into one sort — the same
    selection bit-for-bit.  ``rate_cap`` pre-shrink remains useful to
    cut the SCANNED volume for extreme quota≪group ratios; it is no
    longer needed for task balance.
    """
    ranked = _two_phase_group_rank(df, group_col, id_col, salt, base_hash)
    return (
        ranked.filter(F.col("_rk") <= quota)
        .drop("_sb", "_sub", "_off", "_tot", "_rk")
    )


def rate_cap(
    df: DataFrame,
    group_counts: dict[str, int],
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    margin: float = 1.25,
    base_hash: str = "xxhash64",
    salt: str = "quota",
) -> DataFrame:
    """Map-only pre-filter for ``quota_sample`` on skewed groups: given
    (approximate) group counts — a prior round's aggregate, or metastore
    stats — keep each group at rate ``margin * quota / count`` so the
    exact window sees ~quota·margin rows per group instead of the full
    group.  Uses the same salt and hash as ``quota_sample``, and keeps
    the LOWEST hash buckets, so whenever the cap retains ≥ quota rows in
    a group (size the ``margin`` for that — 1.25 gives ~5σ headroom at
    quota ≥ 1000), the survivors include every exact winner and
    composing rate_cap → quota_sample returns exactly what quota_sample
    alone would."""
    rates = {
        g: min(1.0, margin * quota / n) if n > 0 else 1.0
        for g, n in group_counts.items()
    }
    return mixture_sample(
        df, rates, group_col, id_col, default_rate=1.0, base_hash=base_hash, salt=salt
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): within a shard, documents are concatenated in id order and
    the token stream is cut into ``capacity``-token sequences.  Emits
    one row per document with its shard, start offset in the shard's
    token stream, and the first/last sequence it lands in (a document
    longer than the remaining room straddles sequences — that's the
    concat-and-chunk contract, not an error).

    Parallelism = shards (each shard's cumsum is an independent window);
    a shard is the unit you'd write as one training file.  Shard
    assignment is by id hash, so adding documents only appends to
    streams, it never reshuffles existing ones between shards.
    """
    shard = F.pmod(hash64(F.col(id_col).cast("string"), base_hash), F.lit(n_shards))
    w = W.partitionBy("shard").orderBy(F.asc(id_col))
    return (
        docs.withColumn("shard", shard.cast("int"))
        .withColumn("_end", F.sum(token_col).over(w))
        .withColumn("start_tok", (F.col("_end") - F.col(token_col)).cast("long"))
        .withColumn(
            "seq_first", F.floor(F.col("start_tok") / F.lit(capacity)).cast("long")
        )
        .withColumn(
            "seq_last",
            F.floor((F.col("_end") - F.lit(1)) / F.lit(capacity)).cast("long"),
        )
        .drop("_end")
    )


def pack_greedy(
    docs: DataFrame,
    capacity: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Whole-document greedy packing (the SFT/instruction-tuning layout:
    documents are never split across sequences, unlike
    :func:`pack_sequences`' concat-and-chunk): within a shard, documents
    are taken in (tokens DESC, id) order and BEST-FIT packed — each doc
    goes into the open bin with the least remaining room that still
    holds it (bisect over sorted residuals, O(n log n) per shard), else
    opens a new bin.  Best-fit-decreasing is the classical strong
    bin-packing heuristic; measured on 2 000 uniform(10,900) lengths at
    capacity 1024 it fills 0.976 of bin space where next-fit-decreasing
    managed 0.73 (pinned in tests/test_sampling.py).  A document LONGER than capacity becomes its own
    overflow bin (``overflow = true``) — truncation is the chunker's
    decision, not the packer's.

    Emits one row per document: (id, n_tokens, shard, bin, bin_fill,
    overflow).  Scale shape: shard by id hash (stable under appends, the
    pack_sequences policy), ONE applyInPandas pass per shard — the
    greedy scan is inherently sequential, so the shard is the
    parallelism unit and nothing ever sorts globally.  Per-task memory
    is one shard's (id, n) pairs, NOT its text.

    Skew bound, measured (tools/bench_skew.py, 2 M docs, 8 shards):
    hash sharding concentrates shard sizes binomially for ANY distinct
    id set — measured spread 249 287–250 645 rows (±0.3 %), 7.0 s wall,
    ≤229 MB worker RSS.  A hot shard requires ADVERSARIALLY crafted ids
    (we planted 50 % of ids hashing to one shard: 86.6 s wall — the
    sequential greedy scan at ~12 µs/row — and 400 MB RSS); real
    corpora can't produce one because ids are deduplicated upstream and
    xxhash64 scrambles any id scheme.  The sizing rule is therefore
    just ``n_shards``: per-task rows ≈ n/n_shards, ~200 B/row in
    pandas, wall O((n/n_shards)·log) — scale n_shards with the cluster.
    """
    import pandas as pd

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    shard = F.pmod(hash64(F.col(id_col).cast("string"), base_hash), F.lit(n_shards))
    slim = docs.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        shard.cast("int").alias("shard"),
    )

    out_schema = (
        f"{id_col} long, n_tokens long, shard int, bin long, "
        "bin_fill long, overflow boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins, fills, over = [], [], []
        nxt = 0
        # open bins as a sorted list of (remaining, bin_id): bisect finds
        # the leftmost bin with remaining >= n — the tightest fit, ties
        # to the lowest bin id, fully deterministic
        res: list[tuple[int, int]] = []
        fill_of: dict[int, int] = {}
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > capacity:
                bins.append(nxt)
                fills.append(n)
                over.append(True)
                nxt += 1
                continue
            i = bisect.bisect_left(res, (n, -1))
            if i < len(res):
                rem, b = res.pop(i)
                rem -= n
            else:
                rem, b = capacity - n, nxt
                nxt += 1
            bisect.insort(res, (rem, b))
            fill_of[b] = fill_of.get(b, 0) + n
            bins.append(b)
            fills.append(fill_of[b])
            over.append(False)
        pdf["bin"] = bins
        pdf["bin_fill"] = fills
        pdf["overflow"] = over
        return pdf

    return slim.groupBy("shard").applyInPandas(pack, schema=out_schema)


def packing_efficiency(packed: DataFrame, capacity: int) -> float:
    """Fraction of non-overflow bin capacity actually filled — the
    padding-waste metric a packing recipe is judged by."""
    row = (
        packed.filter(~F.col("overflow"))
        .groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("fill"))
        .agg(F.sum("fill").alias("t"), F.count("*").alias("b"))
        .collect()[0]
    )
    return float(row["t"]) / (int(row["b"]) * capacity) if row["b"] else 1.0


def shuffle_order(
    df: DataFrame,
    seed: str = "shuffle",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Deterministic global training order: every row gets a
    ``shuffle_pos`` in [0, n) — the position it would occupy after
    shuffling the whole dataset with the given ``seed``.  Reproducible
    epochs, resumable data loaders, and auditable "what did the model
    see before step k" queries all hang off this one column.

    The naive Spark expression — ``row_number() OVER (ORDER BY hash)``
    — is a single-partition sort: a scale killer.  This is the
    two-phase shape instead:

    1. salt+hash every id, bucket the hash into ``n_buckets`` pmod
       groups (map-only);
    2. ONE tiny aggregate counts rows per bucket; the cumulative
       offsets (n_buckets rows) broadcast as a literal map;
    3. rank WITHIN each bucket (window partitioned by bucket — the one
       real shuffle, each task sorting ~1/n_buckets of the data) and
       add the bucket's offset.

    The global order is (bucket, hash, id) lexicographic — a pure
    function of (data, seed), independent of partitioning, cluster
    size, or execution order, so reruns and the DuckDB oracle agree
    bit-for-bit.  At 100 TB: n_buckets scales with the cluster (each
    bucket must fit one task's sort), the offsets stay n_buckets longs,
    and everything else is map-only.  Below ``_OFFSET_LIT_MAX`` buckets
    the offsets ride the plan as one ``create_map`` literal; past it —
    the 10⁴–10⁵-bucket cluster regime — they become a broadcast-joined
    offsets frame instead, because a create_map of 2·n_buckets ``F.lit``
    calls re-creates the per-element py4j plan-build pathology this repo
    has fixed three times (~1.4 s at 3 k elements, and the plan string
    itself grows O(n_buckets)).
    """
    h = hash64(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")), base_hash)
    keyed = df.withColumn("_h", h).withColumn(
        "_b", F.pmod(F.col("_h"), F.lit(n_buckets))
    )
    counts = {
        r["_b"]: r["c"]
        for r in keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    rn = F.row_number().over(
        W.partitionBy("_b").orderBy(F.col("_h"), F.col(id_col))
    )
    if n_buckets <= _OFFSET_LIT_MAX:
        off_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        return keyed.withColumn(
            "shuffle_pos",
            (off_map[F.col("_b")] + rn - F.lit(1)).cast("long"),
        ).drop("_h", "_b")
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()], "_b bigint, _off bigint"
        )
    )
    return (
        keyed.withColumn("_rn", rn)
        .join(off_df, "_b")
        .withColumn("shuffle_pos", (F.col("_off") + F.col("_rn") - F.lit(1)).cast("long"))
        .drop("_h", "_b", "_rn", "_off")
    )
