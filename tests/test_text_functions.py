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
