import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions import text as T


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "a b"),  # shorter than shingle size
        (3, "der hund und die katze und das haus"),
        (4, "xyzzy plugh"),  # no markers
        (5, "  spaced   out\ttext  "),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def _get(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


def test_token_counts(tdf):
    ws = _get(tdf, T.n_tokens_ws("text"))
    assert ws[1] == 9
    re = _get(tdf, T.n_tokens_re("text"))
    assert re[1] == 10  # trailing '.' counts as its own token


def test_truncate_tokens(tdf):
    out = _get(tdf, T.truncate_tokens("text", 3))
    assert out[1] == "The quick brown"
    assert out[2] == "a b"


def test_word_shingles_short_doc_empty(tdf):
    out = _get(tdf, T.word_shingles("text", 3))
    assert out[2] == []
    assert "The quick brown" in out[1]
    assert len(out[1]) == 7


def test_lang_id(tdf):
    out = _get(tdf, T.lang_id("text"))
    assert out[1] == "en"
    assert out[3] == "de"
    assert out[4] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "id int, text string",
    )
    fps = set(_get(df, T.fingerprint_md5("text")).values())
    assert len(fps) == 1


def test_quality_score_bounds(tdf):
    out = _get(tdf, T.quality_score("text"))
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # text 1: 44 chars (below 50-char band → 0) + stopword ratio 2/9 (0.4)
    # + punct ratio 1/44 ≤ 0.1 (0.2)
    assert out[1] == pytest.approx(0.6)


def test_repetition_stats_known_values(spark):
    from readwise_vector_db_spark.suites.text_analysis import repetition_stats
    import readwise_vector_db_spark.sources.tables as tables

    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # top-uni 4/4; bigrams all "a a" 3/3; tris dup 1/2... 
            (2, "x y z w v u"),        # no repetition at all
            (3, "a b a b a b a b"),    # alternating: heavy bigram repetition
            (4, "one two"),            # <3 tokens -> dropped
        ],
        "doc_id long, text string",
    )
    orig = tables.load_table
    try:
        tables.load_table = lambda spark, sf_dir, name, **kw: df
        # repetition_stats resolves load_table at module level — patch there
        import readwise_vector_db_spark.suites.text_analysis as ta
        ta_orig = ta.load_table
        ta.load_table = lambda spark, sf_dir, name, **kw: df
        try:
            rows = {r["doc_id"]: r for r in repetition_stats(spark, "ignored").collect()}
        finally:
            ta.load_table = ta_orig
    finally:
        tables.load_table = orig

    assert set(rows) == {1, 2, 3}  # doc 4 dropped (no trigrams)
    r1 = rows[1]
    assert r1["top_unigram_frac"] == 1.0
    assert r1["top_bigram_frac"] == 1.0
    assert r1["dup_trigram_frac"] == 0.5  # 2 trigrams, 1 distinct
    assert r1["keep"] is False
    r2 = rows[2]
    assert r2["top_unigram_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["keep"] is True
    r3 = rows[3]
    assert r3["top_unigram_frac"] == 0.5
    assert r3["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert r3["keep"] is False


def test_engine_case_mapping_is_internally_consistent(spark):
    """r11: the engine's two lowercase paths — JVM `F.lower` (Spark
    operators) and Python `str.lower` (Arrow scorers) — must agree on
    FULL Unicode case mapping, or LM/signal tokenization diverges from
    Spark-side normalization on Turkish/Greek text.  (DuckDB's lower()
    differs on İ and final sigma — a stated ORACLE-scope limit on
    non-ASCII-case text, not an engine inconsistency; fixtures are
    ASCII so the gates are unaffected.)"""
    from pyspark.sql import functions as F

    cases = ["İstanbul", "ΣΙΓΜΑ ΤΈΛΟΣ", "STRASSE ß", "ǅungla", "ﬁle FI"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    for r in df.select("t", F.lower("t").alias("l")).collect():
        assert r["l"] == r["t"].lower(), r["t"]
